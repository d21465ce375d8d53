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

  test("every query executes against a zero-row corpus without throwing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      // raw read + limit(0) preserves each table's on-disk schema (the
      // Tables readers apply the same conversions they apply at size)
      spark.read.parquet(s"$sfTiny/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // trims m4's eager grid, same as the PlanSpec sweeps — grid topology
    // is not what this sweep tests, and the reduced grid exercises the
    // identical empty-input code paths
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
      s"${failures.size} queries throw on an empty corpus:\n" +
        failures.mkString("\n"))
  }
}
