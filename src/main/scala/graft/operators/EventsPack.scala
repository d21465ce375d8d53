package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, TimestampType}

/** Event-time operators beyond the reference's daily rollups
  * (db/submission_stats.py) — the two shapes every large-scale event
  * pipeline needs and the reference's Postgres layer never had to express:
  * gap-based sessionization and the as-of (most-recent-prior) join.
  *
  * Scale design: both are ONE shuffle on `user_id`, then window functions
  * inside each partition — no range join, no self-join, no driver loop.
  * The naive as-of formulation is an inequality join (`v.ts <= c.ts`),
  * which Spark can only execute as a broadcast-nested-loop — quadratic
  * per user and a non-starter at 100 TB. The union+last-carry-forward
  * plan below is the standard sort-merge reformulation: linear in events,
  * partitioned by user, and AQE-coalescible. The DuckDB oracle for
  * `ev_asof_join` deliberately USES the naive inequality-join formulation,
  * so the two plans check each other.
  */
object EventsPack {

  /** Session gap: a new session starts after 30 minutes of inactivity.
    * Microsecond integer arithmetic — exact in both engines (no float
    * interval math). */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Incident half-window (±5 min) and the range-join cell width. The cell
    * is exactly the FULL window span, so every interval covers at most two
    * cells — the blocking factor is a hard constant, not data-dependent. */
  val HalfWinUs: Long = 5L * 60 * 1000 * 1000
  val CellUs: Long = 2 * HalfWinUs

  /** Attribution lookback horizon (7 days) — ONE definition interpolated
    * into the engine's window filter and the oracle's join predicate. */
  private[graft] val AttribHorizonUs: Long = 7L * 24 * 3600 * 1000000

  /** Conversion floor of the A/B test: a user converts on any purchase of
    * value ≥ this. Sits near the purchase-value p80 on the fixture, so
    * both variants carry non-degenerate proportions at every sf. */
  private[graft] val AbConvMin = 150L

  /** Nearest-touch horizon (±1 h) — ONE definition interpolated into the
    * engine's selection and the oracle's candidate predicate. */
  private[graft] val NearHorizonUs: Long = 3600L * 1000000

  /** The gap-session core shared by `ev_sessionize` and the sweep-line
    * concurrency rollup: lag → boundary flag → running sum = session index,
    * then the per-session interval. One shuffle on `user_id`; the groupBy
    * rides the window's HashPartitioning. */
  private[graft] def sessionIntervals(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(runW))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- gap-based sessionization --------------------------------------
    // lag → boundary flag → running sum = session index; then per-session
    // rollup. The groupBy keys start with user_id, so the window exchange's
    // HashPartitioning(user_id) already satisfies the aggregation's
    // distribution — one shuffle total.
    "ev_sessionize" -> ((s, d) => {
      sessionIntervals(Tables.events(s, d))
        .withColumn("duration_us",
          unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
        .orderBy("user_id", "session_idx")
    }),

    // ---- as-of join: each click to the most recent prior view ----------
    // Tag both sides, sort by (ts, side, event_id) within user — views
    // (side 0) before clicks at equal ts, so `view.ts <= click.ts` ties
    // match — and carry the last view forward with last(..., ignoreNulls).
    // Tie-break among equal-ts views: the largest event_id (sorted last,
    // last() wins). Left-outer by construction: a click with no prior view
    // carries NULLs.
    "ev_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def side(t: String, tag: Int): DataFrame =
        ev.filter(col("event_type") === t)
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(tag).as("side"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      side("view", 0).unionByName(side("click", 1))
        .withColumn("view_id",
          last(when(col("side") === 0, col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("view_ts",
          last(when(col("side") === 0, col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"), col("view_id"), col("view_ts"))
        .orderBy("click_id")
    }),

    // ---- volume-concentration deciles (Lorenz curve) ----------------------
    // How concentrated is event volume across users — the inequality
    // readout behind every skew decision (a fat top decile IS the salting
    // / AQE-skew-join trigger; the same curve prices "how much does
    // deduping the heaviest sources buy"). An ntile(10) window over the
    // per-user rollup would funnel every user through ONE task (Spark
    // itself warns `WindowExec: No Partition Defined`) — at 100 TB that
    // is 10⁸–10⁹ rows in a single partition inside the very operator
    // whose job is diagnosing skew. Instead the decile AGGREGATE is
    // computed exactly, with no per-user ranking at all: tied users are
    // interchangeable (identical n_events), so each decile's
    // (n_users, events) depends only on HOW MANY users of each distinct
    // volume fall inside its rank interval — pure interval-overlap
    // arithmetic on the distinct-volume frame. That frame is
    // value-domain-bounded (≤ max per-user volume, ≪ users), and its
    // exact prefix sums come from a chunked two-level scheme: a
    // PARTITIONED within-chunk running sum plus a broadcast triangle
    // join over the tiny chunk frame — no unpartitioned WindowExec
    // anywhere in the plan (pinned in PlanSpec). The result is
    // bit-identical to the oracle's native ntile(10) ORDER BY
    // (n_events, user_id): rank intervals follow the SQL ntile split
    // (first N mod 10 buckets get one extra row).
    "ev_concentration" -> ((s, d) => {
      val cnt0 = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        .groupBy(col("n_events")).agg(count(lit(1)).as("c"))
      // exact global prefix sums over the volume frame, scale-safe:
      // within-chunk cumulative (partitioned window) + chunk offsets via
      // the shared Chunked broadcast triangle. The chunk id is
      // RANGE-derived (≤ 4096 chunks for ANY volume domain — a fixed
      // `div 1024` bound only held while volumes were dense near zero;
      // review-caught). The expensive pre-shuffle pipeline (events scan
      // + user rollup) is shared across branches by exchange reuse —
      // verified in PlanSpec.
      val cnt = cnt0
        .crossJoin(broadcast(cnt0.agg(min(col("n_events")).as("vlo"),
          max(col("n_events")).as("vhi"))))
        .withColumn("chunk", Chunked.chunkId("n_events", "vlo", "vhi"))
      val wIn = Window.partitionBy(col("chunk")).orderBy(col("n_events"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inChunk = cnt.withColumn("cum_in", sum(col("c")).over(wIn))
      val chunkSums = cnt.groupBy(col("chunk")).agg(sum(col("c")).as("cc"))
      val chunkOff = Chunked.crossChunk(chunkSums, "chunk", "cc",
        _ < _, c => coalesce(sum(c), lit(0L)), "chunk_off")
      val nTotal = chunkSums.agg(sum(col("cc")).as("n_total"))
      // users of volume v occupy global ranks (off, off + c]; decile k
      // covers ranks ((k-1)q + min(k-1, r), kq + min(k, r)] for
      // q = N div 10, r = N mod 10 — the SQL ntile split. Contribution
      // of v to decile k = interval overlap; events = overlap · v.
      val dec = inChunk.join(broadcast(chunkOff), "chunk")
        .withColumn("off", col("chunk_off") + col("cum_in") - col("c"))
        .crossJoin(broadcast(nTotal))
        .withColumn("q", expr("n_total div 10"))
        .withColumn("r", col("n_total") % 10L)
        .withColumn("decile", explode(sequence(lit(1L), lit(10L))))
        .withColumn("lo", greatest(
          (col("decile") - 1L) * col("q")
            + least(col("decile") - 1L, col("r")) + 1L,
          col("off") + 1L))
        .withColumn("hi", least(
          col("decile") * col("q") + least(col("decile"), col("r")),
          col("off") + col("c")))
        .filter(col("hi") >= col("lo"))
        .withColumn("ov", col("hi") - col("lo") + 1L)
        .groupBy(col("decile"))
        .agg(sum(col("ov")).as("n_users"),
          sum(col("ov") * col("n_events")).as("events"))
      // cumulative + grand total over the ≤10-row decile frame via one
      // broadcast self-join with conditional sums — no global window, so
      // the no-unpartitioned-WindowExec pin holds for the whole plan.
      dec.as("a").join(broadcast(dec.as("b")), lit(true))
        .groupBy(col("a.decile").as("decile"),
          col("a.n_users").as("n_users"), col("a.events").as("events"))
        .agg(
          sum(when(col("b.decile") <= col("a.decile"), col("b.events")))
            .as("cum_events"),
          sum(col("b.events")).as("total"))
        .select(col("decile"), col("n_users"), col("events"),
          col("cum_events"),
          expr("cum_events * 1000L div total").as("cum_share_permille"))
        .orderBy("decile")
    }),

    // ---- bidirectional nearest-event join --------------------------------
    // Every purchase matched to its NEAREST marketing touch in EITHER
    // direction within [[NearHorizonUs]] — the merge_asof(direction =
    // 'nearest') generalization of ev_asof_join's backward-only carry:
    // the shape sensor/log alignment needs when clocks jitter both ways.
    // Linear formulation: the tagged union scans TWICE inside one
    // user_id partitioning — a backward carry in (ts, side, id) order
    // and a forward carry in the exact reverse — so each purchase reads
    // both neighbours as plain columns and the selection (smaller gap,
    // ties backward) is per-row arithmetic; one exchange, two
    // in-partition sorts, no inequality join anywhere. Tie semantics
    // fall out of the shared sort key: a same-instant touch sorts
    // backward (side 0 first — gap 0, max event_id among equals), the
    // forward carry is strictly-later (min event_id among equals). The
    // oracle takes the naive candidate-join + rank road with the same
    // (gap, side, ±id) order, so the formulations check each other.
    "ev_nearest_touch" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), lit(0).as("side"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), lit(1).as("side"))
      val wb = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("side").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def touchOnly(c: Column) = when(col("side") === 0, c)
      val us = unix_micros(col("ts"))
      val gapB = us - col("b_us")
      val gapF = col("f_us") - us
      val bOk = col("b_us").isNotNull && gapB <= NearHorizonUs
      val fOk = col("f_us").isNotNull && gapF <= NearHorizonUs
      val useB = bOk && (!fOk || gapB <= gapF)
      touches.unionByName(purch)
        .withColumn("b_id",
          last(touchOnly(col("event_id")), ignoreNulls = true).over(wb))
        .withColumn("b_us",
          last(touchOnly(unix_micros(col("ts"))), ignoreNulls = true)
            .over(wb))
        .withColumn("b_type",
          last(touchOnly(col("event_type")), ignoreNulls = true).over(wb))
        .withColumn("f_id",
          last(touchOnly(col("event_id")), ignoreNulls = true).over(wf))
        .withColumn("f_us",
          last(touchOnly(unix_micros(col("ts"))), ignoreNulls = true)
            .over(wf))
        .withColumn("f_type",
          last(touchOnly(col("event_type")), ignoreNulls = true).over(wf))
        .filter(col("side") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"),
          when(useB, col("b_id")).when(fOk, col("f_id")).as("touch_id"),
          when(useB, col("b_type")).when(fOk, col("f_type"))
            .as("touch_type"),
          when(useB, gapB).when(fOk, gapF).as("gap_us"),
          when(useB, lit("back")).when(fOk, lit("fwd")).as("direction"))
        .orderBy("purchase_id")
    }),

    // ---- last-touch attribution with a lookback horizon ------------------
    // Every purchase attributed to the user's most recent preceding
    // marketing touch (click OR view) within [[AttribHorizonUs]] — the
    // as-of join generalized to a multi-type touch stream plus a horizon,
    // the canonical revenue-attribution shape. Same linear formulation as
    // ev_asof_join (tagged union, one user_id window, last(ignoreNulls));
    // the horizon applies AFTER the carry-forward — sound because touches
    // only get older further back: if the newest touch is outside the
    // horizon, every touch is. A touch at exactly the purchase instant
    // counts (side 0 sorts first). The oracle takes the inequality-join
    // road so the two formulations check each other.
    "ev_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), lit(0).as("side"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), lit(1).as("side"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def lastTouch(c: Column): Column =
        last(when(col("side") === 0, c), ignoreNulls = true).over(w)
      touches.unionByName(purchases)
        .withColumn("t_id", lastTouch(col("event_id")))
        .withColumn("t_type", lastTouch(col("event_type")))
        .withColumn("t_ts", lastTouch(col("ts")))
        .filter(col("side") === 1)
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("t_ts")))
        .withColumn("in_horizon", col("gap_us") <= AttribHorizonUs)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"),
          when(col("in_horizon"), col("t_id")).as("touch_id"),
          when(col("in_horizon"), col("t_type")).as("touch_type"),
          when(col("in_horizon"), col("gap_us")).as("gap_us"))
        .orderBy("purchase_id")
    }),

    // ---- robust daily-volume anomalies (median/MAD) ---------------------
    // Days whose event volume deviates from the per-type median by more
    // than 3× the median absolute deviation — the robust z-score every
    // ingest monitor runs (means/stddevs are themselves dragged by the
    // outliers they're meant to flag; the median/MAD pair is not). Two
    // exact-percentile passes over the DAY-cardinality rollup (the raw
    // stream is touched once, by the daily groupBy; medians buffer only
    // |days| values per type) with the tiny per-type frames broadcast
    // back. Numeric parity: medians of integers are exact halves, the
    // deviation algebra stays in that exact-double class in both engines
    // (Spark `percentile` ≡ DuckDB `quantile_cont`, the a10 pairing).
    "ev_anomaly_mad" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast(DateType).as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy("event_type")
        .agg(percentile(col("n"), lit(0.5)).as("med"))
      val dev = daily.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("n") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(percentile(col("adev"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .filter(col("adev") > lit(3.0) * col("mad"))
        .select(col("event_type"), col("day"), col("n"), col("med"),
          col("mad"))
        .orderBy("event_type", "day")
    }),

    // ---- top 3-step behavioural paths (sequence mining) -----------------
    // ev_transitions' first-order model extended one step: the most
    // frequent (step1 → step2 → step3) windows over each user timeline —
    // funnel DISCOVERY (which paths exist) where ev_funnel measures a
    // path fixed in advance. Two stacked lags over ONE user_id window
    // (no self-joins); only complete triples count, each with its exact
    // per-mille share of all triples. The result frame is ≤ |types|³
    // rows; top-25 with a total tiebreak.
    "ev_paths3" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val c = Tables.events(s, d)
        .withColumn("p1", lag(col("event_type"), 1).over(w))
        .withColumn("p2", lag(col("event_type"), 2).over(w))
        .filter(col("p2").isNotNull)
        .groupBy(col("p2").as("step1"), col("p1").as("step2"),
          col("event_type").as("step3"))
        .agg(count(lit(1)).as("n"))
      // total from the <= |types|^3 grouped frame — never a second pass
      // over the event stream (the grouped exchange is reused)
      c.crossJoin(broadcast(c.agg(sum(col("n")).as("n_total"))))
        .select(col("step1"), col("step2"), col("step3"), col("n"),
          expr("n * 1000L div n_total").as("permille"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(25)
    }),

    // ---- rolling 7-day distinct actives (WAU per day) -------------------
    // Sliding-window COUNT DISTINCT — the one rolling metric a window
    // function cannot give (distinct doesn't decompose over frames) and a
    // per-day self-join of the raw stream would pay 7× quadratically. The
    // scalable reformulation: dedupe to user-days FIRST (the distinct that
    // matters — raw event volume never multiplies), then each user-day
    // contributes itself to the ≤ 7 window-end days it belongs to via a
    // BOUNDED explode, and one (day, user) distinct-count closes it.
    // Shuffle volume is 7 × |user-days|, independent of event count.
    "ev_rolling_wau" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val ud = ev
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast(DateType).as("day"))
        .distinct()
      // max day straight off the raw stream — same value as max over the
      // deduped frame, without re-running the dominant user-day distinct
      // for a 1-row bound
      val bounds = ev.agg(
        max(date_trunc("day", col("ts")).cast(DateType)).as("mx"))
      ud.withColumn("off", explode(sequence(lit(0), lit(6))))
        .select(col("user_id"), date_add(col("day"), col("off")).as("day_t"))
        .crossJoin(broadcast(bounds))
        .filter(col("day_t") <= col("mx"))
        .groupBy(col("day_t").as("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .orderBy("day")
    }),

    // ---- cohort retention triangle ---------------------------------------
    // The standard product-analytics rollup (and, for a training-data
    // platform, the contributor-activity view): users cohorted by their
    // FIRST active day, each cohort's distinct-active count at every day
    // offset, with the retention rate as exact integer per-mille against
    // the cohort size. Plan shape: one per-user min (combinable), a join
    // back on the bucketed user stream, one (cohort, offset)
    // distinct-count — all shuffles keyed on user_id or the tiny
    // (cohort, offset) grid; nothing quadratic, nothing ordered globally. -
    "ev_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast(DateType).as("day"))
      val firstDay = ev.groupBy("user_id")
        .agg(min(col("day")).as("cohort_day"))
      val cohortSize = firstDay.groupBy("cohort_day")
        .agg(count(lit(1)).as("cohort_n"))
      ev.join(firstDay, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast(LongType)
            .as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(cohortSize), Seq("cohort_day"))
        .select(col("cohort_day"), col("day_offset"), col("n_active"),
          col("cohort_n"),
          expr("(n_active * 1000L) div cohort_n").as("retention_permille"))
        .orderBy("cohort_day", "day_offset")
    }),

    // ---- ordered conversion funnel: signup → click → purchase ----------
    // Per-user firsts under ORDER constraints (the click must be at or
    // after the first signup, the purchase at or after that click) via
    // three stacked unbounded windows over the SAME user_id partitioning —
    // one exchange total, no self-joins. Each window min is a constant per
    // user, so the later steps read the earlier ones as plain columns.
    // ">= " ties count (an event at exactly the prior step's instant
    // converts), pinned in OperatorInvariantsSpec. The DuckDB oracle takes
    // the join road (filter + re-aggregate per step) so the two
    // formulations check each other.
    "ev_funnel" -> ((s, d) => funnelSummary(Tables.events(s, d))),

    // ---- two-proportion A/B test (experimentation readout) --------------
    // The experiment summary every product-analytics layer serves: users
    // deterministically hash-split into two variants (the md5-parity
    // draw — the same engine-defined coin as the sampling family),
    // conversion = the user ever made a ≥ [[AbConvMin]]-value purchase
    // (plain "ever purchased" is vacuous on this fixture — every user
    // has; pool = 1 degenerates the z denominator to 0/0), then the
    // two-proportion pooled z-score. Counting is EXACT integers (one
    // combinable per-user rollup — max(converted) — then one 2-row
    // aggregate); the rates and z are IEEE divisions/sqrt over those
    // exact integers in ONE fixed formula, so both engines land on
    // bit-equal doubles (the a16 sufficient-statistics discipline); a
    // degenerate pool (all or none converted) yields a NULL z instead of
    // an ANSI divide-by-zero. Scale: the per-user rollup is the only
    // event-volume shuffle; everything after is constant-sized.
    "ev_ab_test" -> ((s, d) => {
      val dbl = org.apache.spark.sql.types.DoubleType
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
            col("value") >= AbConvMin, 1L).otherwise(0L))
          .as("conv"))
        .withColumn("vb",
          pmod(conv(substring(md5(concat(lit("ab:"),
            col("user_id").cast("string"))), 1, 8), 16, 10)
            .cast(LongType), lit(2L)))
      users.agg(
          sum(when(col("vb") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("vb") === 0, col("conv")).otherwise(0L)).as("c_a"),
          sum(when(col("vb") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("vb") === 1, col("conv")).otherwise(0L)).as("c_b"))
        // an empty arm (every sampled user hashed to one variant — routine
        // on small cohorts) rates NULL instead of tripping ANSI divide;
        // z_score's pool-in-(0,1) guard already covers the rest
        .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          (col("c_a").cast(dbl) / nullif(col("n_a").cast(dbl), lit(0.0)))
            .as("rate_a"),
          (col("c_b").cast(dbl) / nullif(col("n_b").cast(dbl), lit(0.0)))
            .as("rate_b"),
          ((col("c_a") + col("c_b")).cast(dbl) /
            nullif((col("n_a") + col("n_b")).cast(dbl), lit(0.0)))
            .as("pool"))
        .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          col("rate_a"), col("rate_b"),
          when(col("pool") > 0.0 && col("pool") < 1.0,
            (col("rate_a") - col("rate_b")) /
              sqrt(col("pool") * (lit(1.0) - col("pool")) *
                (lit(1.0) / col("n_a").cast(dbl) +
                  lit(1.0) / col("n_b").cast(dbl)))).as("z_score"))
    }),

    // ---- event-type transition matrix -----------------------------------
    // First-order behavioural model: counts of (previous type → type)
    // steps per user timeline, with a START pseudo-state for each user's
    // first event, and each cell's row-normalized per-mille. One shuffle
    // on user_id for the lag; the matrix itself is |types+1|² rows, and
    // the row normalizer is a window over that tiny frame — at any scale
    // the heavy part is exactly the one partition-and-sort the lag needs.
    "ev_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cells = Tables.events(s, d)
        .withColumn("prev_type",
          coalesce(lag(col("event_type"), 1).over(w), lit("START")))
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val rowW = Window.partitionBy(col("prev_type"))
      cells.withColumn("row_n", sum(col("n")).over(rowW))
        .select(col("prev_type"), col("event_type"), col("n"),
          expr("n * 1000L div row_n").as("permille"))
        .orderBy("prev_type", "event_type")
    }),

    // ---- sweep-line peak concurrency per day ---------------------------
    // Max concurrent sessions (any users) per calendar day: each session
    // interval is clipped into per-day segments (explode over the days it
    // spans — bounded by session length, not data size), every segment
    // emits a +1 at its start and a −1 just past its inclusive end (the
    // `seg_hi + 1` encoding IS what makes touching intervals concurrent:
    // a session ending at t still holds its slot when another starts at t,
    // spec-pinned), and a running sum ordered by (time, delta) inside each
    // day partition gives the concurrency profile. The (t, delta) tie
    // order sorts −1 before +1, which correctly keeps a segment ending at
    // t−1 apart from one starting at t — and makes the day's MAX
    // order-invariant under ties. Scale shape: the day is the partition
    // key, so every day sweeps independently — no global ordering, no
    // single-partition bottleneck; a midnight-crossing session contributes
    // a self-contained segment to each day it touches (its −1 boundary
    // may lie past midnight but stays IN the day's partition, so the
    // per-day running sum is closed).
    "ev_concurrency" -> ((s, d) =>
      dailyPeakConcurrency(Tables.events(s, d))),

    // ---- no-equi-key interval join, cell-blocked -----------------------
    // Purchases falling inside platform-wide incident windows (±5 min
    // around each error event): there is NO join key, only the range
    // predicate — Spark executes `p.ts BETWEEN w.lo AND w.hi` as a
    // broadcast-nested-loop, quadratic and a non-starter once both sides
    // are large. The scale formulation quantizes time into cells exactly
    // one window-span wide: each window covers ≤ 2 cells (a hard constant
    // — explode is bounded), each probe maps to exactly 1 cell, and the
    // pair search becomes a shuffled EQUI join on the cell id (plan-pinned
    // in PlanSpec: no nested-loop, no cartesian) followed by the exact
    // range filter. A probe's single cell means a (window, probe) pair can
    // match at most once — no dedup pass. The DuckDB oracle takes the
    // naive BETWEEN join on purpose, so the blocking must be semantically
    // invisible.
    "j12_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val wins = incidentWindows(ev)
      val matched = cellCandidates(wins, purchaseProbes(ev))
        .filter(col("p_us") >= col("lo_us") && col("p_us") <= col("hi_us"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_purchases"))
      wins.join(matched, Seq("win_id"), "left")
        .select(col("win_id"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
        .orderBy("win_id")
    }),

    // ---- the probe-side view: per-purchase incident coverage -----------
    // The same cell-blocked join read from the other side — each purchase
    // tagged with the number of windows covering it, zeros kept. This is
    // the serving shape (and the streaming incidentGate's batch twin):
    // label arriving rows against a frozen window set.
    "j12_purchase_tags" -> ((s, d) => {
      val ev = Tables.events(s, d)
      purchaseIncidentTags(incidentWindows(ev), purchaseProbes(ev))
        .orderBy("p_id")
    }),

    // ---- the blocking monitor: candidate volume vs true matches --------
    // How many (window, probe) pairs the cell join surfaced, how many
    // survived the exact range filter, and the false-candidate rate — the
    // number that says whether the cell width is tuned. Every count is
    // integer and the oracle replays the cell assignment itself, so the
    // BLOCKING layer (not just the final join) is oracle-gated.
    "j12_range_stats" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val wins = incidentWindows(ev)
      val purch = purchaseProbes(ev)
      val cand = cellCandidates(wins, purch)
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("p_us") >= col("lo_us") &&
            col("p_us") <= col("hi_us"), 1L).otherwise(0L))
            .as("n_matched"))
      cand.crossJoin(broadcast(
          wins.agg(count(lit(1)).as("n_windows"))))
        .crossJoin(broadcast(
          purch.agg(count(lit(1)).as("n_probes"))))
        .select(col("n_windows"), col("n_probes"), col("n_candidates"),
          col("n_matched"),
          when(col("n_candidates") > 0,
            expr("(n_candidates - n_matched) * 1000L div n_candidates"))
            .otherwise(0L).as("cand_fp_permille"))
    })
  )

  /** The funnel core: per-user ordered firsts via three stacked unbounded
    * windows over one `user_id` partitioning (each window min is constant
    * per user, so later steps read earlier ones as plain columns), then
    * the three-row step summary. */
  private[graft] def funnelSummary(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perUser = ev
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("s_ts",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" &&
          col("ts") >= col("s_ts"), col("ts"))).over(w))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("c_ts"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("s_ts")).as("s_ts"), min(col("c_ts")).as("c_ts"),
        min(col("p_ts")).as("p_ts"))
    perUser.agg(count(lit(1)).as("n_users"),
        count(col("s_ts")).as("n_signup"),
        count(col("c_ts")).as("n_click"),
        count(col("p_ts")).as("n_purchase"))
      .select(explode(array(
        struct(lit(1L).as("step"), lit("signup").as("stage"),
          col("n_users").as("n_entered"),
          col("n_signup").as("n_converted")),
        struct(lit(2L).as("step"), lit("click").as("stage"),
          col("n_signup").as("n_entered"),
          col("n_click").as("n_converted")),
        struct(lit(3L).as("step"), lit("purchase").as("stage"),
          col("n_click").as("n_entered"),
          col("n_purchase").as("n_converted")))).as("r"))
      .select(col("r.step").as("step"), col("r.stage").as("stage"),
        col("r.n_entered").as("n_entered"),
        col("r.n_converted").as("n_converted"))
      .withColumn("conv_permille",
        when(col("n_entered") > 0,
          expr("n_converted * 1000L div n_entered")).otherwise(0L))
      .orderBy("step")
  }

  /** The sweep-line core: sessions clipped to per-day segments, ±1
    * boundary rows, running sum inside each day partition, day MAX. */
  private[graft] def dailyPeakConcurrency(ev: DataFrame): DataFrame = {
    val seg = sessionIntervals(ev)
      .select(unix_micros(col("start_ts")).as("lo_us"),
        unix_micros(col("end_ts")).as("hi_us"),
        to_date(col("start_ts")).as("start_day"),
        to_date(col("end_ts")).as("end_day"))
      .select(explode(sequence(col("start_day"), col("end_day")))
        .as("day"), col("lo_us"), col("hi_us"))
      .withColumn("day_lo", unix_micros(col("day").cast(TimestampType)))
      .select(col("day"),
        greatest(col("lo_us"), col("day_lo")).as("seg_lo"),
        least(col("hi_us"), col("day_lo") + lit(86399999999L))
          .as("seg_hi"))
    // both boundary rows explode out of ONE pass over the segments — a
    // union of two selects would re-run the whole sessionize-and-clip
    // chain (lag window, running sum, groupBy, day explode) per branch;
    // exchange reuse only dedups the shuffle below it
    val bounds = seg.select(col("day"), explode(array(
        struct(col("seg_lo").as("t_us"), lit(1L).as("delta")),
        struct((col("seg_hi") + lit(1L)).as("t_us"),
          lit(-1L).as("delta")))).as("b"))
      .select(col("day"), col("b.t_us").as("t_us"),
        col("b.delta").as("delta"))
    // Two-level sweep: a day-partitioned running sum is correct but puts
    // a whole DAY's boundary stream through one sort task — at 100 TB a
    // hot day (10⁹ sessions) is a single-task funnel even though the
    // window has a partition key. Split each day into minute buckets:
    // the running sum decomposes as (Σ deltas of earlier buckets) +
    // (within-bucket running sum) — the ev_concentration chunked-prefix
    // scheme. The within-bucket window partitions on (day, bucket); the
    // bucket-offset prefix runs per day over the ≤ 1441-row bucket frame
    // (clock-bounded, not data-bounded); the day peak is the max of
    // offset + within-bucket max. Ties never split across buckets (equal
    // t_us ⇒ equal bucket), so the (t_us, delta) tie order is preserved
    // and the result is identical to the single-pass sweep.
    val b = bounds.withColumn("bkt", expr(s"t_us div ${SweepBucketUs}L"))
    val wIn = Window.partitionBy(col("day"), col("bkt"))
      .orderBy(col("t_us"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = b.withColumn("run_in", sum(col("delta")).over(wIn))
      .groupBy(col("day"), col("bkt"))
      .agg(max(col("run_in")).as("peak_in"),
        sum(col("delta")).as("bsum"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("starts"))
    val wOff = Window.partitionBy(col("day")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("boff", coalesce(sum(col("bsum")).over(wOff), lit(0L)))
      .groupBy(col("day"))
      .agg(max(col("boff") + col("peak_in")).as("peak_concurrent"),
        sum(col("starts")).as("n_sessions"))
      .orderBy("day")
  }

  /** Sweep-bucket width of [[dailyPeakConcurrency]]'s two-level running
    * sum: one minute — ≤ 1441 buckets per day (clock-bounded), each
    * holding only its own minute's boundary rows. */
  private[graft] val SweepBucketUs = 60000000L

  /** ±5-min incident windows around error events: `(win_id, lo_us, hi_us)`,
    * bounds inclusive. */
  private[graft] def incidentWindows(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"),
        (unix_micros(col("ts")) - lit(HalfWinUs)).as("lo_us"),
        (unix_micros(col("ts")) + lit(HalfWinUs)).as("hi_us"))

  /** Purchase probes with their single cell assignment. */
  private[graft] def purchaseProbes(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      .withColumn("cell", expr(s"p_us div ${CellUs}L"))

  /** The probe-side view of the range join — each purchase tagged with
    * how many incident windows cover it (0 kept) — shared verbatim by the
    * batch entry `j12_purchase_tags` and the streaming
    * [[graft.streaming.EventStream.incidentGate]]: the window set is the
    * frozen per-corpus-version artifact, a micro-batch pays one cell
    * equi-join of ITS OWN rows against it. */
  private[graft] def purchaseIncidentTags(wins: DataFrame,
      probes: DataFrame): DataFrame = {
    val m = cellCandidates(wins, probes)
      .filter(col("p_us") >= col("lo_us") && col("p_us") <= col("hi_us"))
      .groupBy(col("p_id")).agg(count(lit(1)).as("n_windows"))
    probes.join(m, Seq("p_id"), "left")
      .select(col("p_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"))
  }

  /** The blocking layer shared by the join and its monitor: windows
    * exploded to their ≤ 2 covered cells, equi-joined to the probes on the
    * cell id — candidate (window, probe) pairs BEFORE the exact range
    * filter. A probe has exactly one cell, so no pair repeats. */
  private[graft] def cellCandidates(wins: DataFrame,
      probes: DataFrame): DataFrame =
    wins.withColumn("cell", explode(sequence(
        expr(s"lo_us div ${CellUs}L"), expr(s"hi_us div ${CellUs}L"))))
      .join(probes, "cell")

  val oracles: Map[String, String] = Map(
    // identical op ORDER in the float tail (two rates, pool, the one
    // z formula) — IEEE ops are correctly rounded, so same inputs + same
    // sequence = bit-equal doubles (the a16 discipline)
    "ev_ab_test" ->
      s"""WITH u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' AND value >= $AbConvMin
        |      THEN 1 ELSE 0 END) AS conv,
        |    ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2 AS vb
        |  FROM events GROUP BY user_id),
        |c AS (SELECT
        |    CAST(SUM(CASE WHEN vb = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN vb = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS c_a,
        |    CAST(SUM(CASE WHEN vb = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN vb = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS c_b
        |  FROM u),
        |r AS (SELECT n_a, c_a, n_b, c_b,
        |    CAST(c_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0.0)
        |      AS rate_a,
        |    CAST(c_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0.0)
        |      AS rate_b,
        |    CAST(c_a + c_b AS DOUBLE) / NULLIF(CAST(n_a + n_b AS DOUBLE),
        |      0.0) AS pool
        |  FROM c)
        |SELECT n_a, c_a, n_b, c_b, rate_a, rate_b,
        |  CASE WHEN pool > 0.0 AND pool < 1.0 THEN
        |    (rate_a - rate_b) / sqrt(pool * (1.0 - pool) *
        |      (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |  END AS z_score
        |FROM r""".stripMargin,

    "ev_retention" ->
      """WITH ev AS (SELECT user_id,
        |  CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |fd AS (SELECT user_id, MIN(day) AS cohort_day FROM ev
        |  GROUP BY user_id),
        |cs AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
        |  FROM fd GROUP BY cohort_day),
        |cell AS (SELECT f.cohort_day,
        |  CAST(date_diff('day', f.cohort_day, e.day) AS BIGINT)
        |    AS day_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        |  FROM ev e JOIN fd f USING (user_id)
        |  GROUP BY f.cohort_day, day_offset)
        |SELECT c.cohort_day, c.day_offset, c.n_active, cs.cohort_n,
        |  CAST(c.n_active * 1000 // cs.cohort_n AS BIGINT)
        |    AS retention_permille
        |FROM cell c JOIN cs USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "ev_sessionize" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev_ts
         |  FROM events),
         |m AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN prev_ts IS NULL
         |           OR epoch_us(ts) - epoch_us(prev_ts) > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM g),
         |x AS (
         |  SELECT user_id, ts,
         |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM m)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
         |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
         |    AS duration_us
         |FROM x GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,

    // the oracle takes the inequality-join road on purpose (fine at oracle
    // scale, checks the engine's linear reformulation independently)
    "ev_asof_join" ->
      """WITH v AS (SELECT user_id, event_id, ts FROM events
        |           WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'click'),
        |cand AS (
        |  SELECT c.event_id AS click_id, v.event_id AS view_id,
        |    v.ts AS view_ts,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts)
        |SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
        |  m.view_id, m.view_ts
        |FROM c LEFT JOIN (SELECT click_id, view_id, view_ts FROM cand
        |                  WHERE rn = 1) m
        |  ON m.click_id = c.event_id
        |ORDER BY click_id""".stripMargin,

    "ev_anomaly_mad" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type, day),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
        |  FROM daily GROUP BY event_type),
        |dev AS (SELECT d.event_type, d.day, d.n, m.med,
        |    abs(d.n - m.med) AS adev
        |  FROM daily d JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT dev.event_type, dev.day, dev.n, dev.med, mad.mad
        |FROM dev JOIN mad USING (event_type)
        |WHERE dev.adev > 3 * mad.mad
        |ORDER BY dev.event_type, dev.day""".stripMargin,

    "ev_paths3" ->
      """WITH t AS (SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS p1,
        |    lag(event_type, 2) OVER w AS p2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT p2 AS step1, p1 AS step2, event_type AS step3,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t WHERE p2 IS NOT NULL GROUP BY p2, p1, event_type),
        |tot AS (SELECT SUM(n) AS n_total FROM c)
        |SELECT step1, step2, step3, n,
        |  CAST(n * 1000 // t.n_total AS BIGINT) AS permille
        |FROM c, tot t
        |ORDER BY n DESC, step1, step2, step3 LIMIT 25""".stripMargin,

    // the naive road: one row per (window-end day, active user) via a
    // range join on the day distance — the explode must be invisible
    "ev_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |b AS (SELECT MAX(day) AS mx FROM ud),
        |t AS (SELECT DISTINCT d.day + CAST(g.i AS INTEGER) AS day
        |  FROM (SELECT DISTINCT day FROM ud) d, generate_series(0, 6) g(i), b
        |  WHERE d.day + CAST(g.i AS INTEGER) <= b.mx)
        |SELECT t.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        |FROM t JOIN ud u ON u.day BETWEEN t.day - 6 AND t.day
        |GROUP BY t.day ORDER BY t.day""".stripMargin,

    "ev_concentration" ->
      """WITH uv AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id),
        |dec AS (SELECT CAST(ntile(10) OVER (ORDER BY n_events, user_id)
        |      AS BIGINT) AS decile, n_events
        |  FROM uv),
        |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(n_events) AS BIGINT) AS events
        |  FROM dec GROUP BY decile),
        |c AS (SELECT decile, n_users, events,
        |    CAST(SUM(events) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_events,
        |    (SELECT CAST(SUM(events) AS BIGINT) FROM g) AS total
        |  FROM g)
        |SELECT decile, n_users, events, cum_events,
        |  cum_events * 1000 // total AS cum_share_permille
        |FROM c ORDER BY decile""".stripMargin,

    // naive candidate join + rank with the engine's exact (gap, side,
    // ±id) tie order: backward prefers the max event_id among equal-gap
    // touches (the carry keeps the LAST in scan order), forward the min
    "ev_nearest_touch" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
         |           WHERE event_type = 'purchase'),
         |t AS (SELECT event_id, user_id, ts, event_type FROM events
         |      WHERE event_type IN ('click', 'view')),
         |cand AS (
         |  SELECT p.event_id AS pid, t.event_id AS tid,
         |    t.event_type AS ttype,
         |    CASE WHEN t.ts <= p.ts
         |      THEN epoch_us(p.ts) - epoch_us(t.ts)
         |      ELSE epoch_us(t.ts) - epoch_us(p.ts) END AS gap_us,
         |    CASE WHEN t.ts <= p.ts THEN 0 ELSE 1 END AS side,
         |    row_number() OVER (PARTITION BY p.event_id ORDER BY
         |      CASE WHEN t.ts <= p.ts
         |        THEN epoch_us(p.ts) - epoch_us(t.ts)
         |        ELSE epoch_us(t.ts) - epoch_us(p.ts) END,
         |      CASE WHEN t.ts <= p.ts THEN 0 ELSE 1 END,
         |      CASE WHEN t.ts <= p.ts THEN -t.event_id
         |        ELSE t.event_id END) AS rn
         |  FROM p JOIN t ON t.user_id = p.user_id
         |    AND abs(epoch_us(t.ts) - epoch_us(p.ts)) <= $NearHorizonUs)
         |SELECT p.event_id AS purchase_id, p.user_id,
         |  p.ts AS purchase_ts,
         |  m.tid AS touch_id, m.ttype AS touch_type,
         |  CAST(m.gap_us AS BIGINT) AS gap_us,
         |  CASE WHEN m.side = 0 THEN 'back'
         |    WHEN m.side = 1 THEN 'fwd' END AS direction
         |FROM p LEFT JOIN (SELECT pid, tid, ttype, gap_us, side FROM cand
         |                  WHERE rn = 1) m
         |  ON m.pid = p.event_id
         |ORDER BY purchase_id""".stripMargin,

    // inequality-join road (horizon inside the candidate join — equivalent
    // to the engine's carry-then-filter because touches only age backwards)
    "ev_attribution" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
         |           WHERE event_type = 'purchase'),
         |t AS (SELECT event_id, user_id, ts, event_type FROM events
         |      WHERE event_type IN ('click', 'view')),
         |cand AS (
         |  SELECT p.event_id AS pid, t.event_id AS tid,
         |    t.event_type AS ttype, t.ts AS tts,
         |    row_number() OVER (PARTITION BY p.event_id
         |      ORDER BY t.ts DESC, t.event_id DESC) AS rn
         |  FROM p JOIN t ON t.user_id = p.user_id AND t.ts <= p.ts
         |    AND epoch_us(p.ts) - epoch_us(t.ts) <= $AttribHorizonUs)
         |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         |  m.tid AS touch_id, m.ttype AS touch_type,
         |  CAST(epoch_us(p.ts) - epoch_us(m.tts) AS BIGINT) AS gap_us
         |FROM p LEFT JOIN (SELECT pid, tid, ttype, tts FROM cand
         |                  WHERE rn = 1) m
         |  ON m.pid = p.event_id
         |ORDER BY purchase_id""".stripMargin,

    "ev_transitions" ->
      """WITH t AS (SELECT user_id,
        |    COALESCE(lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id), 'START') AS prev_type,
        |    event_type
        |  FROM events),
        |cells AS (SELECT prev_type, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t GROUP BY prev_type, event_type)
        |SELECT prev_type, event_type, n,
        |  CAST(n * 1000 // SUM(n) OVER (PARTITION BY prev_type)
        |    AS BIGINT) AS permille
        |FROM cells ORDER BY prev_type, event_type""".stripMargin,

    // the oracle builds each step by join + re-aggregate (filter against
    // the previous step's min, then MIN again) — independent of the
    // engine's stacked-window formulation
    "ev_funnel" ->
      """WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
        |      FROM events e JOIN s USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts >= s.s_ts
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |      GROUP BY e.user_id),
        |agg AS (SELECT
        |  (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
        |  (SELECT COUNT(*) FROM s) AS n_signup,
        |  (SELECT COUNT(*) FROM c) AS n_click,
        |  (SELECT COUNT(*) FROM p) AS n_purchase),
        |rows_ AS (
        |  SELECT 1 AS step, 'signup' AS stage,
        |    n_users AS n_entered, n_signup AS n_converted FROM agg
        |  UNION ALL SELECT 2, 'click', n_signup, n_click FROM agg
        |  UNION ALL SELECT 3, 'purchase', n_click, n_purchase FROM agg)
        |SELECT CAST(step AS BIGINT) AS step, stage,
        |  CAST(n_entered AS BIGINT) AS n_entered,
        |  CAST(n_converted AS BIGINT) AS n_converted,
        |  CAST(CASE WHEN n_entered > 0
        |       THEN n_converted * 1000 // n_entered ELSE 0 END AS BIGINT)
        |    AS conv_permille
        |FROM rows_ ORDER BY step""".stripMargin,

    "ev_concurrency" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev_ts
         |  FROM events),
         |m AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN prev_ts IS NULL
         |           OR epoch_us(ts) - epoch_us(prev_ts) > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM g),
         |x AS (
         |  SELECT user_id, ts,
         |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM m),
         |s0 AS (SELECT user_id, session_idx,
         |    MIN(ts) AS start_ts, MAX(ts) AS end_ts
         |  FROM x GROUP BY user_id, session_idx),
         |seg AS (
         |  SELECT CAST(u.d AS DATE) AS day,
         |    epoch_us(start_ts) AS lo_us, epoch_us(end_ts) AS hi_us
         |  FROM s0, UNNEST(generate_series(
         |    CAST(date_trunc('day', start_ts) AS TIMESTAMP),
         |    CAST(date_trunc('day', end_ts) AS TIMESTAMP),
         |    INTERVAL 1 DAY)) AS u(d)),
         |seg2 AS (SELECT day,
         |    GREATEST(lo_us, epoch_us(CAST(day AS TIMESTAMP))) AS seg_lo,
         |    LEAST(hi_us, epoch_us(CAST(day AS TIMESTAMP)) + 86399999999)
         |      AS seg_hi
         |  FROM seg),
         |b AS (SELECT day, seg_lo AS t_us, 1 AS delta FROM seg2
         |  UNION ALL SELECT day, seg_hi + 1, -1 FROM seg2),
         |r AS (SELECT day, delta,
         |    SUM(delta) OVER (PARTITION BY day ORDER BY t_us, delta
         |      ROWS UNBOUNDED PRECEDING) AS running
         |  FROM b)
         |SELECT day, CAST(MAX(running) AS BIGINT) AS peak_concurrent,
         |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sessions
         |FROM r GROUP BY day ORDER BY day""".stripMargin,

    // the oracle takes the naive BETWEEN join — the cell blocking must be
    // semantically invisible
    "j12_range_join" ->
      s"""WITH w AS (SELECT event_id AS win_id,
         |    epoch_us(ts) - $HalfWinUs AS lo_us,
         |    epoch_us(ts) + $HalfWinUs AS hi_us
         |  FROM events WHERE event_type = 'error'),
         |p AS (SELECT epoch_us(ts) AS p_us FROM events
         |      WHERE event_type = 'purchase'),
         |m AS (SELECT w.win_id, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM w JOIN p ON p.p_us BETWEEN w.lo_us AND w.hi_us
         |  GROUP BY w.win_id)
         |SELECT w.win_id, CAST(COALESCE(m.n, 0) AS BIGINT) AS n_purchases
         |FROM w LEFT JOIN m USING (win_id)
         |ORDER BY win_id""".stripMargin,

    // naive BETWEEN LEFT join from the probe side
    "j12_purchase_tags" ->
      s"""WITH w AS (SELECT epoch_us(ts) - $HalfWinUs AS lo_us,
         |    epoch_us(ts) + $HalfWinUs AS hi_us
         |  FROM events WHERE event_type = 'error'),
         |p AS (SELECT event_id AS p_id, epoch_us(ts) AS p_us FROM events
         |      WHERE event_type = 'purchase'),
         |m AS (SELECT p.p_id, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p JOIN w ON p.p_us BETWEEN w.lo_us AND w.hi_us
         |  GROUP BY p.p_id)
         |SELECT p.p_id, CAST(COALESCE(m.n, 0) AS BIGINT) AS n_windows
         |FROM p LEFT JOIN m USING (p_id)
         |ORDER BY p_id""".stripMargin,

    // this one DOES replay the cell assignment — the blocking layer
    // itself is oracle-gated, not just the joined result
    "j12_range_stats" ->
      s"""WITH w AS (SELECT event_id AS win_id,
         |    epoch_us(ts) - $HalfWinUs AS lo_us,
         |    epoch_us(ts) + $HalfWinUs AS hi_us
         |  FROM events WHERE event_type = 'error'),
         |p AS (SELECT epoch_us(ts) AS p_us FROM events
         |      WHERE event_type = 'purchase'),
         |wc AS (SELECT win_id, lo_us, hi_us, u.cell
         |  FROM w, UNNEST(generate_series(lo_us // $CellUs,
         |    hi_us // $CellUs)) AS u(cell)),
         |pc AS (SELECT p_us, p_us // $CellUs AS cell FROM p),
         |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |    CAST(SUM(CASE WHEN p_us BETWEEN lo_us AND hi_us
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
         |  FROM wc JOIN pc USING (cell))
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_windows,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_probes,
         |  n_candidates, n_matched,
         |  CAST(CASE WHEN n_candidates > 0
         |    THEN (n_candidates - n_matched) * 1000 // n_candidates
         |    ELSE 0 END AS BIGINT) AS cand_fp_permille
         |FROM c""".stripMargin
  )
}
