package graft.streaming

import graft.functions.TextFunctions._
import graft.operators.PipelinePack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming half of the corpus-prep pipeline: the stateless quality/language
  * gates plus content-hash dedup applied AT INGEST, as documents land.
  *
  * This is the standard split for a continuous corpus build: the per-row
  * gates and exact dedup are streaming-safe (pure codegen expressions + one
  * state row per distinct content hash inside the watermark horizon), while
  * the MinHash-LSH near-dup sweep stays a periodic batch pass over the
  * accumulated corpus ([[graft.operators.PipelinePack]] `pipe_corpus_prep`)
  * — LSH bucketing needs the whole corpus, so it has no bounded-state
  * streaming form. Gate constants are shared with the batch pipeline, so
  * the GATES accept the same rows by construction. The dedup tie-break
  * differs by design: the stream keeps the first-ARRIVED copy of a
  * duplicate (arrival order — there is no "lowest id so far" in an
  * unbounded stream), while the batch rebuild keeps the lowest doc_id; the
  * surviving sets have identical content hashes, but a consumer reconciling
  * stream vs batch output must compare by content hash, not doc_id.
  */
object DocStream {

  /** Raw schema of the documents parquet. */
  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming source over the documents table (at scale: the landing
    * directory new document files drop into). */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Gated, exact-deduped document stream. Documents have no event time —
    * dedup keys on arrival (processing) time: `current_timestamp()` is
    * fixed per micro-batch, and `dropDuplicatesWithinWatermark` evicts hash
    * state an hour after arrival, so a continuous deployment holds one
    * state row per distinct recent document, not per distinct document
    * ever (the same state-leak guard as the events stream dedup). */
  def corpusGate(spark: SparkSession, dir: String): DataFrame =
    source(spark, dir)
      .select(col("doc_id"), col("text"),
        tokenCount(col("text")).as("n_tokens"),
        stopwordRatio(col("text")).as("stop_ratio"),
        langGuess(col("text")).as("pred_lang"))
      .filter(col("pred_lang") === "en" &&
        col("n_tokens") >= PipelinePack.MinTokens &&
        col("stop_ratio") >= PipelinePack.MinStopRatio)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("arrival", current_timestamp())
      .withWatermark("arrival", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
      .select("doc_id", "text", "n_tokens", "content_hash")
}
