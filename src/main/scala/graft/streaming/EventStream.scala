package graft.streaming

import graft.plans.Checkpointed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming equivalents of the reference's polling daemons
  * (reference §2.12: hl_extractor/hl_calc.py:22,227-231 30 s sleep loops,
  * db/submission_stats.py:103-107 daily catch-up).
  *
  * The reference approximates a stream with SQL polling; here each daemon is
  * a `readStream` + `Trigger.AvailableNow` run: incremental, checkpointed,
  * and identical in semantics to the batch rollup. Watermarking bounds state
  * for true continuous deployment; content-hash dropDuplicates carries the
  * reference's D1 dedup into streaming.
  */
object EventStream {

  /** Literal schema of the current-generation events drop (TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) → TimestampNTZ). Used when the landing directory
    * has no file yet — the at-scale deployment model constructs the stream
    * BEFORE the first file arrives, so the source must not require a footer
    * to exist. */
  val defaultRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Raw schema of the events parquet, read from the file's own footer — a
    * file-stream source needs an explicit schema, and the generator's
    * physical ts type has changed across data drops (nanos-as-long vs
    * TIMESTAMP(MICROS); see Tables.normalizeEventTs), so deriving it from
    * the footer keeps the stream source correct under either. The footer
    * read costs one metadata fetch, once per stream construction. When the
    * landing file does not exist yet (empty landing dir at deploy time),
    * fall back to [[defaultRawSchema]] instead of failing construction —
    * with the usual streaming-schema caveat: a first file whose physical
    * ts type differs from the fallback (an old-generation nanos-as-long
    * drop) fails its micro-batch with a parquet conversion error, and the
    * fix is a stream RESTART (the source then reads the real footer);
    * Spark file streams cannot change schema mid-stream either way.
    * Existence goes through the dir's Hadoop filesystem, not java.io.File,
    * so URI-form paths (file:/, hdfs://, s3a://) resolve correctly. */
  def rawSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$dir/events.parquet").schema
    else defaultRawSchema
  }

  /** Streaming source over the events table. The `glob` default selects
    * the canonical single-file testdata drop; restart-recovery tests
    * stream their own multi-file landing dirs with `"*.parquet"` (the
    * at-scale deployment shape — files keep arriving between runs). */
  def source(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame = {
    // stream the table directory, selecting only the events file — a file
    // stream source must point at a directory (at scale this is the
    // date-partitioned landing dir new files drop into). Timestamp handling
    // is Tables.normalizeEventTs, SHARED with the batch loader so streaming
    // and batch read ts at the same resolution by construction.
    graft.Tables.normalizeEventTs(spark,
      spark.readStream.schema(rawSchema(spark, dir))
        .option("pathGlobFilter", glob)
        .parquet(dir))
  }

  /** Daily submission stats as a streaming aggregation (reference T1).
    * `approx_count_distinct` replaces the exact distinct (not available in
    * streaming aggregation); the batch path (StatsPack t1) stays exact. */
  def dailyStats(spark: SparkSession, dir: String): DataFrame =
    source(spark, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        // graft.Exprs policy: exact decimal sum, double at the edge
        sum(graft.Exprs.dec(col("value"))).cast(DoubleType)
          .as("total_value"))
      .select(col("w.start").cast(DateType).as("day"),
        col("n"), col("approx_users"), col("total_value"))

  /** Streaming content-hash dedup (reference D1 in streaming form):
    * duplicates within the watermark horizon are dropped by state store.
    * `dropDuplicatesWithinWatermark` — NOT plain `dropDuplicates`, which
    * only evicts state when the event-time column is part of the key, so a
    * continuous deployment would accumulate one state row per distinct
    * (user, hash) forever. The hash recipe is Exprs.eventContentHash,
    * shared with the batch pipeline (s2) so batch and stream drop the same
    * rows by construction. */
  def dedupedSubmissions(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame =
    source(spark, dir, glob)
      .withColumn("content_hash",
        graft.Exprs.eventContentHash(col("event_type"), col("value"),
          col("props")))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("user_id", "content_hash")

  /** The reference's transactional per-key submission counter (W6:
    * db/data.py:273-288, MAX+1 per gid at insert time) in TRUE streaming
    * form: `flatMapGroupsWithState` keeps one long of state per key — the
    * next offset — and assigns dense offsets to each micro-batch's rows in
    * (ts, event_id) order. Batch recompute (StatsPack w6) and this stream
    * agree whenever events arrive in timestamp order per key; state is one
    * long per key, so the state store stays tiny at any corpus size. */
  def offsetAssignments(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    source(spark, dir, glob)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[Long]) => {
          val base = state.getOption.getOrElse(0L)
          // order by FULL microsecond precision: Timestamp.getTime truncates
          // to millis, which would let the event_id tiebreak override a real
          // sub-millisecond ts ordering and diverge from the batch window
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000 + (t.getNanos / 1000) % 1000
          val sorted = rows.toIndexedSeq.sortBy(r => (micros(r._3), r._2))
          state.update(base + sorted.size)
          sorted.iterator.zipWithIndex.map { case ((u, e, _), i) =>
            (u, e, base + i)
          }
        })
      .toDF("user_id", "event_id", "submission_offset")
  }

  /** Gap-based sessionization in TRUE streaming form — the streaming twin
    * of EventsPack `ev_sessionize`, sharing [[graft.operators.EventsPack
    * .SessionGapUs]]. A session CLOSES (and emits) the moment a later
    * event from its user arrives more than the gap after the session's
    * end; the one trailing open session per active user is a single
    * state row with an EVENT-TIME timeout at `end + gap`, so the
    * watermark closes idle sessions and evicts their state — state is
    * bounded by users active inside the gap horizon, never by history.
    * (Batch `ev_sessionize` additionally numbers sessions per user; a
    * stream cannot know a global per-user index across restarts, so the
    * streamed row identifies a session by its boundaries instead.)
    * Output: (user_id, n_events, start_us, end_us, duration_us), micros
    * since epoch. Parity with the batch rollup is spec-pinned. */
  def sessions(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = graft.operators.EventsPack.SessionGapUs
    source(spark, dir, glob)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) => {
          // state = (start_us, end_us, n_events) of the open session
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000 + (t.getNanos / 1000) % 1000
          def sessionRow(o: (Long, Long, Long)) =
            (uid, o._3, o._1, o._2, o._2 - o._1)
          if (state.hasTimedOut) {
            val closed = sessionRow(state.get)
            state.remove()
            Iterator(closed)
          } else {
            // micro-batch values arrive unsorted; order like the batch
            // window (ts micros, event_id tiebreak)
            val evs = rows.toIndexedSeq
              .map(r => (micros(r._3), r._2)).sorted.map(_._1)
            val out =
              scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
            var open = state.getOption
            evs.foreach { us =>
              open match {
                case Some((st, en, n)) if us - en <= gapUs =>
                  // in-gap event extends the session — including rows that
                  // arrive OUT OF ORDER across micro-batches, as long as
                  // they are still above the watermark (rows BELOW it never
                  // reach this function: Spark filters late input ahead of
                  // event-time-timeout stateful operators — the pinned
                  // StreamingSpec late-delivery contract)
                  open = Some((st, math.max(en, us), n + 1))
                case Some(o) =>
                  out += sessionRow(o)
                  open = Some((us, us, 1L))
                case None =>
                  open = Some((us, us, 1L))
              }
            }
            open match {
              case Some(o) =>
                val toMs = (o._2 + gapUs) / 1000 + 1
                if (toMs <= state.getCurrentWatermarkMs()) {
                  // gap already elapsed relative to the watermark — close
                  // now (setTimeoutTimestamp would reject a past instant)
                  out += sessionRow(o)
                  state.remove()
                } else {
                  state.update(o)
                  state.setTimeoutTimestamp(toMs)
                }
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
        })
      .toDF("user_id", "n_events", "start_us", "end_us", "duration_us")
  }

  /** The reference's daily-stats catch-up daemon (db/submission_stats
    * .py:80-124: wake, read the statistics table's high watermark,
    * batch-compute only the missing days, append) as a streaming gate —
    * the last reference daemon without a streaming twin (VERDICT r12
    * item 7). The ledger artifact and its head (watermark day +
    * cumulative seed) resolve ONCE at gate construction, exactly like
    * the daemon's SELECT max(collected); each micro-batch then feeds its
    * own fresh rows (ts past the watermark) through the SAME
    * ledgerCatchupCore the batch operator runs, emitting the full
    * ledger ∪ fresh series. Exact distincts stay exact because the
    * rollup runs per catch-up batch — the daemon's real cadence is one
    * run per day, one batch per run; a multi-batch replay would need
    * per-day re-aggregation across batches, which is the batch
    * operator's job, not the daemon's. Row-for-row parity with
    * `t1_incremental` is pinned in StreamingSpec. */
  def ledgerCatchupGate(spark: SparkSession, dir: String)
      : DataFrame => DataFrame = {
    val p = graft.operators.StatsPack.ensureStatsLedger(spark, dir)
    val ledger = spark.read.parquet(s"$p/daily")
    val (wmOpt, seed) = graft.operators.StatsPack.ledgerHead(ledger)
    batch => {
      val fresh = wmOpt match {
        case Some(wm) => batch.filter(to_date(col("ts")) > lit(wm))
        case None => batch
      }
      graft.operators.StatsPack.ledgerCatchupCore(ledger, seed, fresh)
    }
  }

  /** Incident-coverage gate at ingest: each arriving micro-batch's
    * purchases are tagged with the number of frozen incident windows
    * covering them — the streaming read side of the cell-blocked range
    * join (`j12_purchase_tags` is the batch twin, row-for-row;
    * StreamingSpec pins it). Deployment shape: the window frame is
    * resolved ONCE per corpus version and MATERIALIZED here
    * (localCheckpoint — a lazy frame would re-run the full window
    * derivation on every micro-batch action, the exact per-batch corpus
    * scan this gate exists to avoid); each batch then pays one bounded
    * cell equi-join of its own rows against the frozen set. */
  def incidentGate(windows: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = {
    val frozen = Checkpointed("EventStream.windows", windows)
    batch =>
      graft.operators.EventsPack.purchaseIncidentTags(frozen,
        graft.operators.EventsPack.purchaseProbes(batch))
  }

  /** TRUE stream-stream interval join: error incidents × purchases with
    * BOTH sides unbounded (incidentGate's window set is a frozen
    * artifact; here new incidents keep arriving with the purchases). The
    * j12 cell quantization carries over verbatim — windows explode to
    * their ≤ 2 covering cells, probes to exactly 1, so the streaming
    * join has an EQUI component (cell) for partitioned state lookup, and
    * the ± [[graft.operators.EventsPack.HalfWinUs]] range rides as a
    * time-range condition BETWEEN THE TWO EVENT-TIME COLUMNS — the form
    * Structured Streaming's state-cleanup analysis recognizes, so each
    * side's buffered rows are evicted once the other side's watermark
    * passes them + the range. State is bounded by (watermark + 10 min)
    * of events per side, independent of stream age. A pair emits exactly
    * once (the probe's single cell), in the micro-batch where the later
    * event arrives; inner-join matches emit immediately (watermarks gate
    * eviction, not emission). */
  def incidentPairs(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    incidentJoin(ev, "inner").select(col("win_id"), col("p_id"))

  /** LEFT-outer twin read from the purchase side: every purchase emits —
    * matched rows immediately, UNCOVERED purchases with a NULL win_id
    * only once BOTH watermarks pass the purchase's join window (the
    * engine can't rule out a future matching incident before that) —
    * the delayed-emission half of the stream-stream join surface, on top
    * of the inner form's immediate-emission half. A row that arrives
    * after the close of the stream therefore never emits its null form;
    * deployments flush with a heartbeat event, and the spec does the
    * same. */
  def incidentPairsOuter(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    incidentJoin(ev, "right_outer").select(col("p_id"), col("win_id"))

  private def incidentJoin(ev: org.apache.spark.sql.DataFrame,
      joinType: String): org.apache.spark.sql.DataFrame = {
    import graft.operators.EventsPack.{CellUs, HalfWinUs}
    // the BETWEEN below is written in interval literals for the cleanup
    // analyzer; keep it equal to the batch core's integer bound
    require(HalfWinUs == 5L * 60 * 1000 * 1000,
      "incidentPairs interval literal out of sync with HalfWinUs")
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("ts").as("err_ts"))
      .withWatermark("err_ts", "10 minutes")
      .withColumn("w_cell", explode(sequence(
        expr(s"(unix_micros(err_ts) - ${HalfWinUs}L) div ${CellUs}L"),
        expr(s"(unix_micros(err_ts) + ${HalfWinUs}L) div ${CellUs}L"))))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
      .withColumn("p_cell", expr(s"unix_micros(p_ts) div ${CellUs}L"))
    errs.join(purch,
      col("w_cell") === col("p_cell") &&
        expr("p_ts BETWEEN err_ts - INTERVAL 5 MINUTES " +
          "AND err_ts + INTERVAL 5 MINUTES"), joinType)
  }
}
