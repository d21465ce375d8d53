package graft

import graft.ingest.PipeExtractor
import org.apache.spark.sql.functions._

/** The external-binary extraction contract (reference M8:
  * hl_calc.py:50-129): ≤20 docs per process call, and silent/failed docs
  * marked processed with an empty `{}` result. */
class PipeExtractorSpec extends SparkSpec {
  import spark.implicits._

  /** Stub extractor: awk echoes each id with the SIZE of the batch it
    * arrived in (so the test can observe per-call batching), and stays
    * silent about ids divisible by 7 (simulating per-doc extractor
    * failures — missing output files in the reference). */
  private lazy val stub: String = {
    val f = java.nio.file.Files.createTempFile("graft_stub_extractor", ".sh")
    java.nio.file.Files.writeString(f,
      """#!/bin/sh
        |exec awk -F'\t' '{ids[NR]=$1}
        |  END {for(i=1;i<=NR;i++) if (ids[i] % 7 != 0)
        |    print ids[i] "\t{\"batch\":" NR "}"}'
        |""".stripMargin)
    f.toFile.setExecutable(true)
    f.toString
  }

  private def run(nDocs: Int, partitions: Int) = {
    // coalesce for the single-partition case: unlike repartition it keeps
    // ascending id order, making the batch boundaries exactly 1-20/21-40/…
    val ranged = spark.range(1, nDocs + 1L)
    val docs = (if (partitions == 1) ranged.coalesce(1)
                else ranged.repartition(partitions))
      .select(col("id"), concat(lit("doc payload "), col("id")).as("payload"))
    PipeExtractor.extract(spark, docs, Seq(stub))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("batches are at most 20 docs per process call, boundaries exact") {
    // single partition: 50 docs must arrive as calls of 20, 20, 10
    val out = run(50, 1)
    assert(out.size == 50)
    // ids divisible by 7 are silent (7 of them in 1..50); the rest report
    // the size of the call that carried them: 35 rode the two full
    // 20-doc calls, 8 the final 10-doc call
    assert(out.values.count(_ == "{\"batch\":20}") == 35)
    assert(out.values.count(_ == "{\"batch\":10}") == 8)
    assert(out.values.count(_ == "{}") == 7)
  }

  test("M4→M8 compose: the eval winner's profile drives the extractor " +
    "over the unprocessed queue end-to-end") {
    import graft.ingest.{EvalProfile, PipeExtractor}
    // a REAL (grid-trimmed) evaluation: the bench-profile 2-combo grid
    // trains actual SMO models, so the composed path starts from a
    // genuine winner, not a synthetic frame
    System.setProperty("graft.bench.profile", "true")
    val evalDf = try {
      // the grid search runs eagerly at query construction; the returned
      // frame is the confusion matrix stamped with the winner columns
      val df = SparkEntry.queries("m4_train_eval")(spark, sfTiny).cache()
      df.count()
      df
    } finally System.clearProperty("graft.bench.profile")
    val prof = EvalProfile.fromEval(evalDf, "fixture-genre")
    evalDf.unpersist()
    // the winner is a member of the declared grid
    assert(prof.gridSize == 2L)
    assert(Seq("basic", "normalized", "gaussianized", "lowlevel", "nobands")
      .contains(prof.bestPrep))
    assert(prof.cvAccuracy >= 0.0 && prof.cvAccuracy <= 1.0)
    // queue scan: docs with doc_id % 3 == 0 already extracted for THIS
    // model; the same table also carries another model's rows, which
    // must NOT shadow this model's queue (per-model anti-join contract)
    val docs = Tables.documents(spark, sfTiny)
    val done = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), lit("fixture-genre").as("model"))
      .unionAll(docs.select(col("doc_id"), lit("other-model").as("model")))
    val qIds = EvalProfile.unprocessedQueue(docs, done, "fixture-genre")
      .select("doc_id").collect().map(_.getLong(0))
    assert(qIds.length == PipeExtractor.DocumentsPerQuery)
    assert(qIds.forall(_ % 3 != 0), "queue contains processed docs")
    // profile-echo stub: each answered line carries back the profile argv
    // (proving the winner reached the binary); ids % 5 == 0 stay silent
    val pstub = {
      val f = java.nio.file.Files.createTempFile("graft_profile_stub", ".sh")
      java.nio.file.Files.writeString(f,
        """#!/bin/sh
          |exec awk -F'\t' -v p="$1" '$1 % 5 != 0 {print $1 "\t" p}'
          |""".stripMargin)
      f.toFile.setExecutable(true)
      f.toString
    }
    val out = EvalProfile.runBatch(spark, docs, done, prof, Seq(pstub))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(out.map(_._1).sorted.toSeq == qIds.sorted.toSeq,
      "extractor output does not cover the queue exactly")
    val (silent, answered) = out.partition(_._1 % 5 == 0)
    assert(silent.nonEmpty && silent.forall(_._2 == "{}"))
    assert(answered.nonEmpty && answered.forall(_._2 == prof.toJson))
    assert(out.forall(r => r._3 == "fixture-genre" &&
      r._4 == EvalProfile.ModelVersion))
    // daemon loop round-trip: runBatch output IS a results increment —
    // feeding it back shrinks the queue by exactly the processed batch
    val batchOut = EvalProfile.runBatch(spark, docs, done, prof, Seq(pstub))
    val next = EvalProfile
      .unprocessedQueue(docs, done.unionByName(
        batchOut.select("doc_id", "model"), allowMissingColumns = false),
        "fixture-genre")
      .select("doc_id").collect().map(_.getLong(0))
    assert(next.intersect(qIds).isEmpty,
      "second poll re-queued documents the first batch already processed")
    assert(next.length == PipeExtractor.DocumentsPerQuery,
      "queue did not advance to the next unprocessed ids")
  }

  test("every doc is answered; extractor-silent docs are marked {} (processed)") {
    val out = run(50, 4) // multi-partition: sizes vary but the cap holds
    assert(out.keySet == (1L to 50L).toSet)
    val (failed, succeeded) = out.partition(_._1 % 7 == 0)
    // ids the stub dropped come back as the empty document — the
    // processed-but-failed marking that keeps them out of the J4 queue
    assert(failed.values.toSet == Set("{}"))
    assert(succeeded.values.forall(_.startsWith("{\"batch\":")))
    // the ≤20 cap holds on every call regardless of partitioning
    val sizes = succeeded.values
      .map(_.stripPrefix("{\"batch\":").stripSuffix("}").toInt)
    assert(sizes.forall(s => s >= 1 && s <= PipeExtractor.MaxItemsPerProcess))
  }
}
