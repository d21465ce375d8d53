package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M4 → M8 composition — the reference's eval-winner extraction daemon
  * (hl_extractor/job_calc.py:97-160): when a dataset grid evaluation
  * finishes, its winning hyperparameter arm becomes the extraction
  * PROFILE (create_profile, job_calc.py:100-125 — a profile.conf the
  * external binary reads), the eval's dataset names the MODEL
  * (get_model_from_eval, job_calc.py:150-158, version fixed "v1"), and
  * the daemon loop feeds the binary every document that has no result
  * for that model yet (get_unprocessed_highlevel_documents_for_model +
  * the J4 anti-join queue shape), batch by batch.
  *
  * Spark-first shape: the profile is a deterministic sorted-key JSON
  * handed to the binary as an argv element (the reference writes a temp
  * yaml file — a per-process file dance Spark executors don't need); the
  * queue scan is the J4 anti-join with the poll cap; the binary runs
  * inside [[PipeExtractor.extract]]'s ≤20-doc per-process batches with
  * the `{}` processed-but-failed marking. Nothing touches the driver but
  * the grid winner itself — a handful of scalars by construction.
  */
object EvalProfile {

  /** Reference model version (job_calc.py:156 — fixed "v1"). */
  val ModelVersion = "v1"

  /** The winning arm of a grid evaluation, plus the model it names. */
  final case class Profile(modelName: String, bestC: Double,
      bestGamma: Double, bestPrep: String, gridSize: Long,
      cvAccuracy: Double) {
    require(!bestC.isNaN && !bestC.isInfinite &&
      !bestGamma.isNaN && !bestGamma.isInfinite &&
      !cvAccuracy.isNaN && !cvAccuracy.isInfinite,
      "profile doubles must be finite — NaN/Infinity are not JSON")
    /** Deterministic profile serialization (sorted keys, no whitespace) —
      * the argv-borne stand-in for the reference's profile.conf. The
      * free-text fields (dataset names are user input in the reference)
      * go through the engine's shared JSON escaper. */
    def toJson: String = {
      import graft.JsonUtil.str
      s"""{"best_c":$bestC,"best_gamma":$bestGamma,""" +
        s""""best_prep":${str(bestPrep)},"cv_accuracy":$cvAccuracy,""" +
        s""""grid_size":$gridSize,"model_name":${str(modelName)},""" +
        s""""model_version":"$ModelVersion"}"""
    }
  }

  /** Read the winning arm off an `m4_train_eval` result frame. Every
    * confusion-matrix row carries the winner columns; they must agree
    * (a frame mixing winners is two evals concatenated — refuse it). */
  def fromEval(evalRows: DataFrame, modelName: String): Profile = {
    val rows = evalRows
      .select(col("best_c"), col("best_gamma"), col("best_prep"),
        col("grid_size"), col("cv_accuracy"))
      .distinct().collect()
    require(rows.length == 1,
      s"eval frame carries ${rows.length} winner tuples, expected 1")
    val r = rows(0)
    Profile(modelName, r.getDouble(0), r.getDouble(1), r.getString(2),
      r.getLong(3), r.getDouble(4))
  }

  /** The daemon's queue scan
    * (get_unprocessed_highlevel_documents_for_model — the J4 anti-join
    * shape): documents with no result row FOR THIS MODEL yet, lowest ids
    * first, at most [[PipeExtractor.DocumentsPerQuery]] per poll.
    * `results` is the (doc_id, model, …) results table — the per-model
    * filter is part of the contract (the reference daemon runs one model
    * at a time against a shared results table; without it, a document
    * extracted under model A would silently never be extracted under
    * model B). The anti-join prunes against the filtered result set (at
    * scale: the results table bucketed on doc_id, same layout the queue
    * queries use); the cap bounds one POLL, not the pipeline — the
    * daemon loops until the queue drains, exactly the reference's
    * batch-at-a-time posture. */
  def unprocessedQueue(docs: DataFrame, results: DataFrame,
      modelName: String): DataFrame =
    docs.join(
        results.filter(col("model") === modelName).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
      .limit(PipeExtractor.DocumentsPerQuery)

  /** One daemon pass: scan the queue, run the external extractor over it
    * with the profile appended to the command line, and return
    * (doc_id, hl_data, model, model_version) rows ready for the results
    * upsert (D5's MERGE shape) — keyed so the output FEEDS BACK into
    * [[unprocessedQueue]] directly, which is the daemon loop. Silent or
    * failed docs come back `{}` — marked processed, so the next poll's
    * anti-join skips them (db/data.py:393-404 via
    * [[PipeExtractor.extract]]). */
  def runBatch(spark: SparkSession, docs: DataFrame, results: DataFrame,
      profile: Profile, command: Seq[String]): DataFrame = {
    val queue = unprocessedQueue(docs, results, profile.modelName)
      .select(col("doc_id").as("id"), col("text").as("payload"))
    PipeExtractor.extract(spark, queue, command :+ profile.toJson)
      .withColumnRenamed("id", "doc_id")
      .withColumn("model", lit(profile.modelName))
      .withColumn("model_version", lit(ModelVersion))
  }
}
