package graft

import graft.sim.IndexStore
import org.apache.spark.sql.DataFrame

/** Persisted index artifacts (sim.IndexStore + SimilarityPack's `_indexed`
  * queries): the plans must SCAN the saved artifact instead of recomputing
  * buckets/centroids, results must equal the inline recompute variants,
  * and a changed corpus must fail the freshness gate. */
class IndexStoreSpec extends SparkSpec {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfTiny)

  private def planOf(name: String): String = {
    val df = run(name)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("indexed ANN plans scan the saved artifact, not a recompute") {
    // NOTE: FileScan Location strings truncate at ~100 chars, so match the
    // artifact-root fragment plus the (possibly truncated) index name
    val km = planOf("ann_kmeans_indexed")
    assert(km.contains("graft_indexes") && km.contains("angular_ivf_kmean"),
      s"kmeans plan should scan the saved index:\n$km")
    // centroid training explodes the embeddings (posexplode) — the indexed
    // query path must not contain it
    assert(!km.contains("posexplode"),
      s"kmeans plan recomputes centroids:\n$km")
    val lsh = planOf("ann_lsh_indexed")
    assert(lsh.contains("graft_indexes") && lsh.contains("angular_lsh"),
      s"lsh plan should scan the saved index:\n$lsh")
    // corpus bucket keys are built by concatenating sign bits — the
    // indexed query path loads them instead
    assert(!lsh.contains("concat"),
      s"lsh plan recomputes bucket keys:\n$lsh")
    val tuned = planOf("ann_tuned_indexed")
    assert(tuned.contains("graft_indexes") &&
      tuned.contains("angular_ivf_tuned"),
      s"tuned plan should scan the saved index:\n$tuned")
    // Lloyd training recomputes centroids via posexplode — the serve path
    // must not contain it (saved members only)
    assert(!tuned.contains("posexplode"),
      s"tuned plan retrains the quantizer:\n$tuned")
    // the artifact carries the vectors (Annoy-style), so the serve path
    // must not scan the corpus table at all
    assert(!tuned.contains("embeddings"),
      s"tuned plan re-joins the corpus:\n$tuned")
    val pq = planOf("ann_pq_indexed")
    assert(pq.contains("graft_indexes") && pq.contains("angular_pq"),
      s"pq plan should scan the saved index:\n$pq")
    assert(!pq.contains("embeddings"),
      s"pq plan re-joins the corpus:\n$pq")
    val vq = planOf("ann_ivfpq_indexed")
    assert(vq.contains("graft_indexes") && vq.contains("angular_ivfpq"),
      s"ivfpq plan should scan the saved index:\n$vq")
    // no training and no corpus scan in the serve path: the artifact
    // carries centroids, codebooks, codes AND vectors. (The query-side
    // LUT legitimately explodes the 10 query vectors — same as pq — so a
    // blanket no-posexplode assert would be wrong here.)
    assert(!vq.contains("embeddings"),
      s"ivfpq plan re-joins the corpus:\n$vq")
  }

  test("indexed results equal the inline recompute variants") {
    // the kmeans inline anchor retired from the suite (r14 audit — its
    // full training-chain oracle moved onto ann_kmeans_indexed); the
    // served-equals-recomputed pin drives the trainer frame directly
    assert(run("ann_kmeans_indexed").collect().map(_.toString).toSeq ==
      operators.SimilarityPack.kmeansTopk(spark, sfTiny, k = 5)
        .collect().map(_.toString).toSeq)
    assert(run("ann_lsh_indexed").collect().map(_.toString).toSeq ==
      run("ann_lsh_multitable").collect().map(_.toString).toSeq)
    assert(run("ann_tuned_indexed").collect().map(_.toString).toSeq ==
      run("ann_ivf_tuned").collect().map(_.toString).toSeq)
    assert(run("ann_pq_indexed").collect().map(_.toString).toSeq ==
      run("ann_pq_adc").collect().map(_.toString).toSeq)
    assert(run("ann_ivfpq_indexed").collect().map(_.toString).toSeq ==
      run("ann_ivfpq").collect().map(_.toString).toSeq)
  }

  // the REAL params the kmeans store is built with — stamping manifests
  // with any other hash would itself read as (correctly) stale
  private def kmeansPh =
    IndexStore.paramsHash(operators.SimilarityPack.KmeansIndexParams)

  test("a changed corpus fails the freshness gate and forces a rebuild") {
    val emb = Tables.embeddings(spark, sfTiny)
    val fp = IndexStore.fingerprint(emb, "vec_id")
    run("ann_kmeans_indexed").collect() // builds if absent
    val p = IndexStore.path(sfTiny, "angular_ivf_kmeans")
    assert(IndexStore.isFresh(spark, p, fp, kmeansPh))
    // simulate corpus drift: the manifest now claims a different corpus
    IndexStore.writeManifest(spark, p, (fp._1 - 1, fp._2, fp._3), kmeansPh)
    assert(!IndexStore.isFresh(spark, p, fp, kmeansPh))
    // an IN-PLACE edit (same count, same max key, different values) is
    // caught by the content component of the fingerprint
    IndexStore.writeManifest(spark, p, fp, kmeansPh)
    assert(IndexStore.isFresh(spark, p, fp, kmeansPh))
    IndexStore.writeManifest(spark, p, (fp._1, fp._2, fp._3 ^ 1L), kmeansPh)
    assert(!IndexStore.isFresh(spark, p, fp, kmeansPh))
    // a BUILD-CONSTANT change with an unchanged corpus is caught by the
    // params hash — under the stable cross-process root this is what
    // prevents prior-run artifacts built by different constants from
    // serving silently
    IndexStore.writeManifest(spark, p, fp,
      IndexStore.paramsHash("lloyd=2,cap=999"))
    assert(!IndexStore.isFresh(spark, p, fp, kmeansPh))
    IndexStore.writeManifest(spark, p, (fp._1 - 1, fp._2, fp._3), kmeansPh)
    // ensure() sees the mismatch, rebuilds, and restamps the manifest
    var rebuilt = false
    IndexStore.ensure(spark, sfTiny, "angular_ivf_kmeans", emb, "vec_id",
      operators.SimilarityPack.KmeansIndexParams) {
      _ => rebuilt = true
    }
    assert(rebuilt)
    assert(IndexStore.isFresh(spark, p, fp, kmeansPh))
  }

  test("concurrent ensure on the same artifact builds exactly once") {
    // the per-path lock contract behind Bench's prepare fan-out: racing
    // threads on ONE artifact serialize, the losers see the winner's
    // fresh manifest and skip the build (a nanoTime params salt forces
    // exactly one rebuild per test run under the stable root)
    val emb = Tables.embeddings(spark, sfTiny)
    val params = s"probe=${System.nanoTime()}"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map(_ => pool.submit(new Runnable {
        def run(): Unit = {
          IndexStore.ensure(spark, sfTiny, "concurrency_probe", emb,
            "vec_id", params) { p =>
            builds.incrementAndGet()
            emb.limit(1).write.mode("overwrite").parquet(s"$p/member")
          }
          ()
        }
      }))
      futs.foreach(_.get())
    } finally pool.shutdown()
    assert(builds.get() == 1,
      s"expected exactly one build under concurrent ensure, got ${builds.get()}")
  }

  test("an older manifest layout reads as stale, not as an error") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val fp = IndexStore.fingerprint(emb, "vec_id")
    val p = IndexStore.path(sfTiny, "angular_ivf_kmeans")
    run("ann_kmeans_indexed").collect() // builds if absent
    // simulate an artifact persisted by the pre-params-hash 3-column
    // manifest format (plausible on shared storage across engine versions):
    // the freshness gate must degrade to a rebuild, not throw
    Seq((fp._1, fp._2, fp._3))
      .toDF("corpus_rows", "max_id", "content_hash").coalesce(1)
      .write.mode("overwrite").parquet(s"$p/manifest")
    assert(!IndexStore.isFresh(spark, p, fp, kmeansPh))
    var rebuilt = false
    IndexStore.ensure(spark, sfTiny, "angular_ivf_kmeans", emb, "vec_id",
      operators.SimilarityPack.KmeansIndexParams) {
      _ => rebuilt = true
    }
    assert(rebuilt)
    assert(IndexStore.isFresh(spark, p, fp, kmeansPh))
  }
}
