package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType}

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- gap-based sessionization --------------------------------------
    // lag → boundary flag → running sum = session index; then per-session
    // rollup. The groupBy keys start with user_id, so the window exchange's
    // HashPartitioning(user_id) already satisfies the aggregation's
    // distribution — one shuffle total.
    "ev_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val runW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_sess")).over(runW))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ts"),
          max(col("ts")).as("end_ts"))
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
    })
  )

  val oracles: Map[String, String] = Map(
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
        |ORDER BY click_id""".stripMargin
  )
}
