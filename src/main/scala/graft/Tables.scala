package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic parquet tables (TESTDATA.md).
  *
  * These play the role of the reference's PostgreSQL tables
  * (reference: admin/sql/create_tables.sql:1-215): `lineitem`/`orders` stand
  * in for the `lowlevel`/`lowlevel_json` fact tables, `events` for the
  * submission time-series, `documents`/`embeddings` for the feature-document
  * and similarity-vector payloads.
  *
  * At 100 TB these would be partitioned-by-date, bucketed-by-key Parquet/Delta
  * layouts; the loaders keep a single place to swap that in (a bucketed
  * `spark.read.table` instead of raw parquet paths).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as nanos-since-epoch and truncate to microseconds (the
    * generator works at microsecond resolution, so this is lossless and
    * matches what DuckDB sees). Shared by the batch loader and the streaming
    * source (EventStream) so both read timestamps at the SAME resolution. */
  def nanosTsToMicros(s: SparkSession, df: => DataFrame): DataFrame = {
    // conf FIRST, then force the frame: spark.read.parquet infers the
    // footer schema at call time, which is exactly what rejects
    // TIMESTAMP(NANOS) unless nanosAsLong is already set — hence the
    // by-name parameter
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def events(s: SparkSession, d: String): DataFrame =
    nanosTsToMicros(s, table(s, d, "events"))
  /** Spread a table across all cores before an expression-heavy map stage
    * (shingling, per-token hashing). The test files are single-row-group
    * parquet, which Spark cannot split — without an explicit spread the
    * whole pre-shuffle map stage runs in ONE task while the other cores
    * idle. Callers apply this ONLY where per-row expression work dominates:
    * a blanket spread costs an exchange per query and fragments iterative
    * ML stages (measured a 2× regression on LBFGS training when applied
    * globally). At 100 TB the inputs arrive as thousands of row groups and
    * the scan is parallel natively — this exchange is a test-layout shim. */
  def spread(df: DataFrame, s: SparkSession): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
