package graft

/** Totality on the zero-row corpus.
  *
  * At 100 TB, empty inputs are not an edge case — they are Tuesday: a
  * catch-up run lands on a day with no events, a new tenant's first
  * ingest sees empty tables, a filter-heavy partition comes back with
  * nothing. Every operator must serve an EMPTY (or seeded-constant)
  * result rather than throw; the classic crash sites are driver-side
  * harvests (`collect()(0)` on a seed/threshold frame that has no rows).
  * This sweep executes all of `SparkEntry.queries` against a corpus of
  * ten zero-row tables with the real schemas — it caught
  * `ann_clustered_recall`'s Gonzalez seed harvest indexing row 0 of an
  * empty sample on day one.
  */
class EmptyCorpusSpec extends SparkSpec {

  private def degenerateSweep(rows: Int, what: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_deg").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      // raw read + limit(n) preserves each table's on-disk schema (the
      // Tables readers apply the same conversions they apply at size)
      spark.read.parquet(s"$sfTiny/$t.parquet").limit(rows)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // trims m4's eager grid, same as the PlanSpec sweeps — grid topology
    // is not what this sweep tests, and the reduced grid exercises the
    // identical degenerate-input code paths
    System.setProperty("graft.bench.profile", "true")
    val failures =
      try {
        for {
          (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
          err <- (try { fn(spark, dir).collect(); None }
                  catch { case e: Throwable =>
                    Some(s"$name: ${e.getClass.getSimpleName} " +
                      s"${Option(e.getMessage).getOrElse("").take(120)}")
                  })
        } yield err
      } finally System.clearProperty("graft.bench.profile")
    assert(failures.isEmpty,
      s"${failures.size} queries throw on $what:\n" +
        failures.mkString("\n"))
  }

  test("every query executes against a zero-row corpus without throwing") {
    degenerateSweep(0, "an empty corpus")
  }

  test("every query executes against a one-row corpus without throwing") {
    // n = 1 breaks DIFFERENT math than n = 0: zero float variance lands
    // ~-1e-22 under sqrt (NaN vs DuckDB error — now clamped), an A/B arm
    // or regression group with a single member divides by zero (now
    // NULLIF on both engines — single-member GROUPS occur at any corpus
    // scale), and the one training row can hash entirely into the test
    // split, leaving the SVM voting over zero classes. All three were
    // caught by this sweep on day one; the full 218-query drive against
    // the one-row corpus matches the DuckDB oracle 217/217 (BASELINE.md).
    degenerateSweep(1, "a one-row corpus")
  }
}
