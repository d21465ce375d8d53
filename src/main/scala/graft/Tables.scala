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
  * The fact tables are served from a MATERIALIZED layout (SURVEY §7.4.8, the
  * Spark analogue of the reference's secondary indexes,
  * admin/sql/create_indexes.sql:1-29): written once per (dir, session) as
  * bucketed-by-key tables — `orders`/`lineitem` by orderkey, `documents` by
  * doc_id, `embeddings` by vec_id — and `events` partitioned by day. The
  * payoff, pinned by PlanSpec/BucketingSpec on executed plans:
  *   - fact⋈fact joins on the bucket key (j1, j7, s8) sort-merge with NO
  *     shuffle exchange on either side;
  *   - doc-keyed aggregations start from data already clustered by doc_id;
  *   - every scan is one task per bucket (32), so expression-heavy map
  *     stages parallelize natively — the single-row-group source files
  *     previously funneled them into one task (the deleted `spread` shim);
  *   - day-partitioned events prune date ranges at the directory level.
  * At 100 TB the same layout is the stored table (written by ingest, read by
  * every query); here it materializes lazily into a temp warehouse.
  */
object Tables {

  /** Buckets per materialized fact table. Matches the drive sessions'
    * `spark.sql.shuffle.partitions` so a bucketed side lines up 1:1 with a
    * shuffled side; at production scale this knob grows with the cluster
    * (buckets should be several × executor count). */
  val BucketCount = 32

  /** Bucket key per fact table — the join/dedup key each table is
    * co-located on. */
  private val bucketKeys: Map[String, String] = Map(
    "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey",
    "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  private lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_warehouse").toString

  /** Raw (un-materialized) read — dimension tables and the materializer
    * itself. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Catalog identifier for `name`'s materialized layout under `dir`
    * (hex of the dir hash keeps names per-scale-factor). */
  private def ident(dir: String, name: String): String =
    s"graft_${name}_" + Integer.toHexString(dir.hashCode)

  /** Per-table materialization locks: DIFFERENT tables (and the same
    * table under different dirs) build concurrently — Bench's prepare
    * fans the layout builds out across threads — while two threads racing
    * the SAME table serialize on its lock and the loser sees the catalog
    * entry and skips. A global lock here would serialize the whole
    * prepare fan-out back to the sum of the writes. */
  private val layoutLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(tbl: String): Object =
    layoutLocks.computeIfAbsent(tbl, _ => new Object)

  /** Materialize-once bucketed layout: first touch per (dir, session)
    * writes the table bucketed+sorted by its key, every later touch is a
    * catalog read. Locked per table: Verify drives queries from 8 threads
    * and Bench's prepare builds layouts concurrently. */
  private def bucketed(s: SparkSession, dir: String, name: String): DataFrame = {
    val tbl = ident(dir, name)
    lockFor(tbl).synchronized {
      if (!s.catalog.tableExists(tbl)) {
        val key = bucketKeys(name)
        table(s, dir, name).write.mode("overwrite")
          .bucketBy(BucketCount, key).sortBy(key)
          .option("path", s"$warehouse/$tbl")
          .saveAsTable(tbl)
      }
      s.table(tbl)
    }
  }

  /** Materialize every fact table's layout up front — Bench calls this
    * before the timed loop (the layout is ingest-time work, not query
    * work) and Verify before its concurrent drive. */
  def prepare(s: SparkSession, dir: String): Unit =
    prepareUnits(s, dir).foreach(_.apply())

  /** The independent per-table units of [[prepare]] — Bench flattens them
    * into its prepare thread pool so layout builds overlap with index
    * builds instead of paying the serial sum. */
  def prepareUnits(s: SparkSession, dir: String): Seq[() => Unit] =
    bucketKeys.keys.toSeq.sorted.map(n => () => { bucketed(s, dir, n); () }) :+
      (() => { eventsPartitioned(s, dir); () })

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = bucketed(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame =
    bucketed(s, d, "lineitem")
  /** Normalize `events.ts` to session-zone TimestampType regardless of how
    * the generator wrote it — the physical type has changed across driver
    * data drops (TIMESTAMP(NANOS) through round 7, TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) since), so the loader dispatches on the type the
    * footer actually declares instead of assuming one:
    *   - LongType — nanos surfaced by `nanosAsLong` (Spark's vectorized
    *     reader rejects TIMESTAMP(NANOS) otherwise): truncate to micros
    *     (lossless — the generator works at microsecond resolution);
    *   - TimestampNTZType — micros with no zone: reinterpret in the session
    *     zone (Engine pins UTC, so the epoch micros are identical to what
    *     DuckDB reads from the same file);
    *   - TimestampType — already normalized.
    * Shared by the materializer and the streaming source (EventStream) so
    * both read timestamps at the SAME resolution. */
  def normalizeEventTs(s: SparkSession, df: => DataFrame): DataFrame = {
    // conf FIRST, then force the frame: spark.read.parquet infers the
    // footer schema at call time, which is exactly what rejects
    // TIMESTAMP(NANOS) unless nanosAsLong is already set — hence the
    // by-name parameter
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val frame = df
    frame.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // The long branch only makes sense for nanos-since-epoch (surfaced
        // by nanosAsLong); a future drop writing plain INT64 micros would
        // be silently divided by 1000 and shift every timestamp. Guard the
        // assumption per-row (an eager min() action would break the shared
        // streaming source): nanos for any date 1973–2100 are >= 1e17,
        // micros are <= ~4e15, so 1e17 cleanly separates them. ts = 0 is
        // additionally allowed (epoch sentinel, common in backfills —
        // and 0 nanos = 0 micros, so the division is exact either way);
        // negative (pre-1970) values stay rejected: nanos and micros are
        // indistinguishable there, and a loud failure beats a silent
        // 1000x shift.
        frame
          .withColumn("ts", when(
            col("ts").isNull || col("ts") === 0L ||
              col("ts") >= lit(100000000000000000L),
            col("ts")).otherwise(raise_error(concat(
              lit("events.ts: long value not nanos-since-epoch "
                + "(plain-micros INT64 drop? see Tables.normalizeEventTs): "),
              col("ts").cast("string")))))
          // `div` (integer division) — `/` is double division and loses
          // precision above 2^53, i.e. for every nanos value
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        frame.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => frame
      case other =>
        // Fail fast at the loader — a malformed drop (e.g. ts as string)
        // previously passed through unnormalized and failed downstream with
        // a far less diagnosable error.
        throw new IllegalStateException(
          s"events.ts: unexpected parquet type $other — expected "
            + "TIMESTAMP(NANOS) (long via nanosAsLong), TIMESTAMP_NTZ, "
            + "or TIMESTAMP")
    }
  }

  /** Day-partitioned events layout, `event_day` as the trailing partition
    * column — filters on it prune at the directory level (PlanSpec pins
    * this on the executed plan). */
  def eventsPartitioned(s: SparkSession, d: String): DataFrame = {
    val tbl = ident(d, "events")
    lockFor(tbl).synchronized {
      if (!s.catalog.tableExists(tbl)) {
        normalizeEventTs(s, table(s, d, "events"))
          .withColumn("event_day", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("event_day")
          .option("path", s"$warehouse/$tbl")
          .saveAsTable(tbl)
      }
      s.table(tbl)
    }
  }

  /** Events in the source column order (queries are written against it;
    * `event_day` remains available via [[eventsPartitioned]]). */
  def events(s: SparkSession, d: String): DataFrame =
    eventsPartitioned(s, d)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  def documents(s: SparkSession, d: String): DataFrame =
    bucketed(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    bucketed(s, d, "embeddings")
}
