package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-LAYOUT operators: multi-dimensional clustering of a table's file
  * layout and the pruning monitor that justifies it.
  *
  * At 100 TB the scan is won or lost before the first task runs: parquet
  * footers carry per-file min/max ranges, and the planner skips files whose
  * range misses the predicate. A single-column sort prunes that column
  * only — a file layout sorted by `l_partkey` is useless to a
  * `l_suppkey`-only predicate (every file spans the whole suppkey domain).
  * Z-ORDER interleaves the bits of BOTH keys into one Morton code, so
  * sorting by it keeps files tight in every interleaved dimension at once:
  * a d-dim box predicate touches O(N^(1−1/d)) of the files instead of all
  * of them (Morton 1966; the Delta Lake / Iceberg `Z-ORDER BY` layout).
  *
  * The Morton code is pure integer bit arithmetic — engine-replayable
  * bit-for-bit, so the LAYOUT (file boundaries and each file's min/max
  * zone map, not just some downstream query) is oracle-gated. The gate
  * assigns files with `ntile` over one global z sort — a deliberate
  * verification shape (DuckDB replays it literally); a production rewrite
  * is `repartitionByRange(F, z) + sortWithinPartitions(z)`, the same
  * layout up to sampled boundary placement, with no single-partition
  * window. The spec pins the property BOTH assignments share — every
  * file owns a contiguous, non-overlapping z range — and that the
  * production path preserves row totals.
  */
object LayoutPack {

  /** Bits per dimension of the interleave; the code spans 42 bits —
    * Long-safe with headroom. Each key is range-NORMALIZED to this budget
    * before interleaving (`key · 2^21 div (max+1)`): raw interleaving
    * hands all significance to the wider column's high bits (lineitem's
    * partkey domain is 20× the suppkey domain, so the top sort levels
    * would all be partkey bits and the suppkey zone maps stay loose —
    * measured 53/64 files touched by the sk-only probe raw vs 17/64
    * normalized at sf0.01, with the pk-box probe improving 9 → 6).
    * Range scaling is the same move production Z-ORDER implementations
    * make before interleaving. */
  private[graft] val ZBits = 21

  /** Target file count of the layout rewrite. */
  private[graft] val ZFiles = 64

  /** Rewrite groups of the compaction plan (`io_compaction_plan`). */
  private[graft] val CompactGroups = 8

  /** Morton interleave of two non-negative keys (x even bits, y odd):
    * an unrolled 2·[[ZBits]]-term sum of shift/mask/scale terms — plain
    * codegen'd integer expression work, no UDF, no loop at runtime. */
  private[graft] def zvalue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftright(x.cast(LongType), i).bitwiseAND(lit(1L)) *
        lit(1L << (2 * i)) +
        shiftright(y.cast(LongType), i).bitwiseAND(lit(1L)) *
          lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL, unrolled identically. */
  private[graft] def zvalueSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((CAST($x AS BIGINT) >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((CAST($y AS BIGINT) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Per-file zone maps under an `ntile(F)`-over-total-order layout:
    * `(file_id, n_rows, min/max of both keys)`. Callers append the RAW
    * key pair to the sort after the clustering key: normalization is
    * non-injective once a key domain exceeds 2^[[ZBits]] (partkey does
    * at sf ≳ 11), so z ties can then span rows with DIFFERENT raw keys —
    * tile membership of such ties would be engine-dependent and the
    * min/max zone maps would flap. The explicit (…, pk, sk) tiebreak
    * makes the total order — and therefore every file's zone map —
    * deterministic at any scale. */
  private def zoneMaps(rows: DataFrame, order: Column*): DataFrame =
    rows.withColumn("file_id",
        ntile(ZFiles).over(Window.orderBy(order: _*)).cast(LongType))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        min(col("sk")).as("min_sk"), max(col("sk")).as("max_sk"))

  private def keyed(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))

  /** The broadcast 1-row max frame both the normalization and the prune
    * monitor's probe bounds derive from — built ONCE per query so
    * Spark's exchange reuse collapses the two consumers onto a single
    * aggregate execution. */
  private def keyMaxes(rows: DataFrame): DataFrame =
    broadcast(rows.agg(max(col("pk")).as("pmax"), max(col("sk")).as("smax")))

  /** Keys range-normalized to the [[ZBits]] budget: `zpk`/`zsk` in
    * [0, 2^21), integer-exact (`k · 2^21 div (max+1)` — the product stays
    * under 2^63 for any key below 2^42). The oracle replays the same
    * normalization. */
  private[graft] def normalizedKeys(rows: DataFrame,
      maxes: DataFrame): DataFrame =
    rows.crossJoin(maxes)
      .withColumn("zpk", expr(s"pk * ${1L << ZBits}L div (pmax + 1L)"))
      .withColumn("zsk", expr(s"sk * ${1L << ZBits}L div (smax + 1L)"))

  private[graft] def normalizedKeys(rows: DataFrame): DataFrame =
    normalizedKeys(rows, keyMaxes(rows))

  /** Count of files whose zone map intersects `[plo,phi] × [slo,shi]`
    * (NULL bound = unbounded side); evaluated against the current frame's
    * `min_pk`/`max_pk`/`min_sk`/`max_sk` columns. */
  private def touched(plo: Column, phi: Column,
      slo: Column, shi: Column): Column =
    sum(when(
      (plo.isNull || col("max_pk") >= plo) &&
        (phi.isNull || col("min_pk") <= phi) &&
        (slo.isNull || col("max_sk") >= slo) &&
        (shi.isNull || col("min_sk") <= shi), 1L).otherwise(0L))

  /** Column spec of the `io_profile_stats` profiler over `orders`: for
    * each column, the canonical BIGINT encoding as (Spark SQL, DuckDB SQL)
    * expression strings — `None` marks a string column (profiled as raw
    * VARCHAR; binary min/max in both engines). ONE list generates BOTH the
    * Spark unpivot and the oracle's UNION ALL, so the two sides cannot
    * drift column-by-column. Encodings are integer-exact: ids as-is,
    * money as floored cents (the a16 discipline), timestamps as epoch
    * micros — a string rendering of doubles/timestamps would hinge on
    * each engine's formatter. */
  private[graft] val ProfileCols: Seq[(String, Option[(String, String)])] =
    Seq(
      ("o_custkey", Some(("CAST(o_custkey AS BIGINT)",
        "CAST(o_custkey AS BIGINT)"))),
      // the source column is TIMESTAMP_NTZ; the session zone is pinned
      // UTC (Engine), so the TIMESTAMP hop reinterprets losslessly and
      // the micros equal DuckDB's naive epoch_us over the same file
      ("o_orderdate", Some(("unix_micros(CAST(o_orderdate AS TIMESTAMP))",
        "epoch_us(o_orderdate)"))),
      ("o_orderkey", Some(("CAST(o_orderkey AS BIGINT)",
        "CAST(o_orderkey AS BIGINT)"))),
      ("o_orderpriority", None),
      ("o_orderstatus", None),
      ("o_totalprice", Some(("CAST(floor(o_totalprice * 100) AS BIGINT)",
        "CAST(floor(o_totalprice * 100) AS BIGINT)")))
    )

  /** The profiler's unpivot: each orders row explodes to |[[ProfileCols]]|
    * (col_name, is_null, v_num, v_str) tuples via a codegen'd
    * inline(array(struct…)) — shared by the exact and sketched profile
    * entries so the two can only diverge in the aggregate, never in the
    * value universe. */
  private def profileRows(s: SparkSession, d: String): DataFrame = {
    val rows = ProfileCols.map { case (name, enc) =>
      struct(lit(name).as("col_name"),
        when(col(name).isNull, 1L).otherwise(0L).as("is_null"),
        enc.map(e => expr(e._1)).getOrElse(lit(null).cast(LongType))
          .as("v_num"),
        (if (enc.isEmpty) col(name) else lit(null).cast("string"))
          .as("v_str"))
    }
    Tables.orders(s, d).select(inline(array(rows: _*)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ANALYZE-style column profile ------------------------------------
    // Per-column null count, exact distinct count and canonical min/max —
    // the statistics a cost-based planner (and every data-quality monitor)
    // collects before anything else. ONE pass: each row unpivots to
    // |cols| (col_name, is_null, v_num, v_str) tuples via a codegen'd
    // inline(array(struct…)) — the same ×k row expansion Spark itself
    // plans for multi-column DISTINCT aggregates (Expand), so the shape is
    // the native one, and the distinct partials dedupe map-side before the
    // |cols|-row result. At 100 TB the swap for the exact n_distinct is
    // the HLL register sketch (sk_hll_distinct) per column — same unpivot,
    // bounded state; exact distinct is the gate shape.
    "io_profile_stats" -> ((s, d) =>
      profileRows(s, d)
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("is_null")).as("n_null"),
          count_distinct(coalesce(col("v_str"),
            col("v_num").cast("string"))).as("n_distinct"),
          min(col("v_num")).as("min_num"), max(col("v_num")).as("max_num"),
          min(col("v_str")).as("min_str"), max(col("v_str")).as("max_str"))
        .orderBy("col_name")),

    // ---- sketched column profile (the 100 TB n_distinct) -----------------
    // The deployment form of io_profile_stats' distinct counts: the SAME
    // unpivot feeds the HLL register sketch ([[graft.operators.Skew
    // .hllDistinctSketch]] — engine-defined layout, so the ESTIMATE is
    // oracle-replayed bit-for-bit) instead of the exact per-column
    // distinct. State is ≤ 512 registers per column (combinable map-side,
    // merges across shards by register MAX), where exact COUNT(DISTINCT)
    // dedups the full value universe — the kmvDistinctSketch /
    // sk_hll_sketch split applied to the profiler. Exact calibration
    // lives in io_profile_stats' gate row; this entry ships sketch-only.
    "io_profile_sketch" -> ((s, d) =>
      Skew.hllDistinctSketch(
        profileRows(s, d).select(col("col_name"),
          coalesce(col("v_str"), col("v_num").cast("string")).as("v")),
        "col_name", col("v"))
        .orderBy("col_name")),

    // ---- the z-ordered layout's zone maps -------------------------------
    // 64 files over lineitem clustered by interleave(l_partkey,
    // l_suppkey). The OUTPUT is the zone map a planner prunes with — the
    // layout itself is what's oracle-checked.
    "io_zorder_layout" -> ((s, d) =>
      zoneMaps(normalizedKeys(keyed(s, d)),
          zvalue(col("zpk"), col("zsk")), col("pk"), col("sk"))
        .orderBy("file_id")),

    // ---- size-based compaction plan over the z-ordered layout ------------
    // The OPTIMIZE/maintenance planner: bin the layout's [[ZFiles]] files
    // into [[CompactGroups]] rewrite groups by consuming files IN LAYOUT
    // ORDER until each group reaches the row target (cum_before div
    // target — one pass, no bin-packing search). Order-preserving
    // consumption is the point: every group covers a CONTIGUOUS z range,
    // so the clustering (and the zone maps' pruning power) SURVIVES the
    // rewrite — a size-greedy packer would interleave ranges and destroy
    // it. The plan runs on the file-STATS frame (manifest metadata, 64
    // rows here, ~10⁵–10⁶ at 100 TB — never the data), which is exactly
    // how production OPTIMIZE planners work; the window over it is the
    // accepted POST-ROLLUP shape. Output: per group, the files consumed,
    // row mass, and the merged zone map a planner would prune the
    // compacted files with.
    "io_compaction_plan" -> ((s, d) => {
      val zm = zoneMaps(normalizedKeys(keyed(s, d)),
        zvalue(col("zpk"), col("zsk")), col("pk"), col("sk"))
      val w = Window.orderBy(col("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      zm.crossJoin(broadcast(zm.agg(sum(col("n_rows")).as("total"))))
        .withColumn("cum_before",
          coalesce(sum(col("n_rows")).over(w), lit(0L)))
        .withColumn("grp", expr(
          s"cum_before div ((total + ${CompactGroups - 1}L) div " +
            s"${CompactGroups}L)"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
          min(col("file_id")).as("file_lo"),
          max(col("file_id")).as("file_hi"),
          min(col("min_pk")).as("min_pk"), max(col("max_pk")).as("max_pk"),
          min(col("min_sk")).as("min_sk"), max(col("max_sk")).as("max_sk"))
        .orderBy("grp")
    }),

    // ---- the pruning monitor: z-order vs single-column sort -------------
    // Two layouts × two predicate shapes, counted against the same zone
    // maps a real planner would consult:
    //   pk_box  — a centered ~10% × ~10% box on (partkey, suppkey)
    //   sk_only — a ~10% suppkey range with partkey UNBOUNDED (the query
    //             a partkey-sorted layout cannot prune at all)
    // Bounds derive from the data's own max keys (scale-invariant integer
    // per-mille arithmetic, replayed by the oracle). The monitor is the
    // justification artifact: linear wins nothing on sk_only (64/64
    // touched), z-order prunes BOTH shapes.
    "io_zorder_prune" -> ((s, d) => {
      val rows = keyed(s, d)
      // ONE max frame: normalization and the probe bounds share its
      // broadcast, so exchange reuse runs the aggregate once
      val b = keyMaxes(rows)
      val zMaps = zoneMaps(normalizedKeys(rows, b),
        zvalue(col("zpk"), col("zsk")), col("pk"), col("sk"))
      val linMaps = zoneMaps(rows, col("pk"), col("sk"))
      def bounds(m: DataFrame) = m.crossJoin(b)
        .withColumn("plo", expr("pmax * 450L div 1000"))
        .withColumn("phi", expr("pmax * 550L div 1000"))
        .withColumn("slo", expr("smax * 450L div 1000"))
        .withColumn("shi", expr("smax * 550L div 1000"))
      val z = bounds(zMaps).agg(
        count(lit(1)).as("n_files"),
        touched(col("plo"), col("phi"), col("slo"), col("shi"))
          .as("z_pk_box"),
        touched(lit(null), lit(null), col("slo"), col("shi"))
          .as("z_sk_only"))
      val lin = bounds(linMaps).agg(
        touched(col("plo"), col("phi"), col("slo"), col("shi"))
          .as("lin_pk_box"),
        touched(lit(null), lit(null), col("slo"), col("shi"))
          .as("lin_sk_only"))
      z.crossJoin(broadcast(lin))
        .select(col("n_files"), col("z_pk_box"), col("z_sk_only"),
          col("lin_pk_box"), col("lin_sk_only"))
    })
  )

  private val zSql = zvalueSql("zpk", "zsk")

  /** The keyed + normalized CTE pair shared by both oracles. */
  private val normSql =
    s"""keyed AS (SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |norm AS (SELECT pk, sk,
       |    pk * ${1L << ZBits} // ((SELECT MAX(pk) FROM keyed) + 1)
       |      AS zpk,
       |    sk * ${1L << ZBits} // ((SELECT MAX(sk) FROM keyed) + 1)
       |      AS zsk
       |  FROM keyed)""".stripMargin

  private val layoutSql =
    s"""WITH $normSql,
       |tiled AS (SELECT pk, sk,
       |    ntile($ZFiles) OVER (ORDER BY $zSql, pk, sk) AS file_id
       |  FROM norm)
       |SELECT CAST(file_id AS BIGINT) AS file_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(pk) AS min_pk, MAX(pk) AS max_pk,
       |  MIN(sk) AS min_sk, MAX(sk) AS max_sk
       |FROM tiled GROUP BY file_id ORDER BY file_id""".stripMargin

  /** The oracle-side image of the profiler's unpivot — the UNION ALL
    * branches interpolate [[ProfileCols]], so the Spark unpivot and both
    * profile oracles share one column list by construction. */
  private val profileBranchesSql: String = ProfileCols.map { case (name, enc) =>
    val vNum = enc.map(_._2).getOrElse("CAST(NULL AS BIGINT)")
    val vStr = if (enc.isEmpty) name else "CAST(NULL AS VARCHAR)"
    s"""SELECT '$name' AS col_name,
       |  CASE WHEN $name IS NULL THEN 1 ELSE 0 END AS is_null,
       |  $vNum AS v_num, $vStr AS v_str FROM orders""".stripMargin
  }.mkString("\nUNION ALL\n")

  val oracles: Map[String, String] = Map(
    "io_profile_stats" ->
      s"""WITH u AS ($profileBranchesSql)
         |SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(is_null) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT COALESCE(v_str, CAST(v_num AS VARCHAR)))
         |    AS BIGINT) AS n_distinct,
         |  MIN(v_num) AS min_num, MAX(v_num) AS max_num,
         |  MIN(v_str) AS min_str, MAX(v_str) AS max_str
         |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,

    // the sk_hll_sketch register replay over the profiler's unpivot —
    // the ESTIMATE is engine-defined integer arithmetic, checked
    // bit-for-bit (one ln in the linear-counting branch, the documented
    // ulp class)
    "io_profile_sketch" ->
      s"""WITH u AS ($profileBranchesSql),
         |vals AS (SELECT col_name,
         |  COALESCE(v_str, CAST(v_num AS VARCHAR)) AS v FROM u
         |  WHERE COALESCE(v_str, CAST(v_num AS VARCHAR)) IS NOT NULL),
         |h AS (SELECT col_name,
         |  ('0x' || substr(md5('hll:' || v), 1, 15))::BIGINT AS hv
         |  FROM vals),
         |rr AS (SELECT col_name, hv // 2251799813685248 AS reg,
         |  hv % 2251799813685248 AS rem FROM h),
         |rho AS (SELECT col_name, reg,
         |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rho
         |  FROM rr),
         |regs AS (SELECT col_name, reg, MAX(rho) AS mj
         |  FROM rho GROUP BY 1, 2),
         |agg AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_regs,
         |  SUM(1::BIGINT << CAST(52 - mj AS INT)) AS sum_present
         |  FROM regs GROUP BY col_name),
         |dig AS (SELECT col_name, 512 - n_regs AS v_zero,
         |  CAST(sum_present + (512 - n_regs) * 4503599627370496 AS BIGINT)
         |    AS sum_scaled FROM agg),
         |raw AS (SELECT col_name, v_zero, sum_scaled,
         |  CAST(('${Skew.HllNumerator}'::HUGEINT // sum_scaled::HUGEINT)
         |    // 1000000 AS BIGINT) AS est_raw FROM dig)
         |SELECT col_name, v_zero, sum_scaled,
         |  CASE WHEN v_zero > 0 AND est_raw <= 1280
         |    THEN CAST(floor(512 * ln(512.0 / v_zero)) AS BIGINT)
         |    ELSE est_raw END AS est_distinct
         |FROM raw ORDER BY col_name""".stripMargin,

    "io_zorder_layout" -> layoutSql,

    // the layout chain + the one-pass ordered binning (cum_before div
    // row-target), replayed value-for-value
    "io_compaction_plan" ->
      s"""WITH $normSql,
         |tiled AS (SELECT pk, sk,
         |    ntile($ZFiles) OVER (ORDER BY $zSql, pk, sk) AS file_id
         |  FROM norm),
         |zm AS (SELECT CAST(file_id AS BIGINT) AS file_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    MIN(pk) AS min_pk, MAX(pk) AS max_pk,
         |    MIN(sk) AS min_sk, MAX(sk) AS max_sk
         |  FROM tiled GROUP BY file_id),
         |c AS (SELECT *,
         |    COALESCE(SUM(n_rows) OVER (ORDER BY file_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before,
         |    (SELECT SUM(n_rows) FROM zm) AS total
         |  FROM zm),
         |g AS (SELECT *, cum_before //
         |    ((total + ${CompactGroups - 1}) // $CompactGroups) AS grp
         |  FROM c)
         |SELECT CAST(grp AS BIGINT) AS grp,
         |  CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
         |  MIN(file_id) AS file_lo, MAX(file_id) AS file_hi,
         |  MIN(min_pk) AS min_pk, MAX(max_pk) AS max_pk,
         |  MIN(min_sk) AS min_sk, MAX(max_sk) AS max_sk
         |FROM g GROUP BY grp ORDER BY grp""".stripMargin,

    "io_zorder_prune" ->
      s"""WITH $normSql,
         |bounds AS (SELECT MAX(pk) * 450 // 1000 AS plo,
         |    MAX(pk) * 550 // 1000 AS phi,
         |    MAX(sk) * 450 // 1000 AS slo,
         |    MAX(sk) * 550 // 1000 AS shi
         |  FROM keyed),
         |zt AS (SELECT pk, sk,
         |    ntile($ZFiles) OVER (ORDER BY $zSql, pk, sk) AS file_id
         |  FROM norm),
         |zm AS (SELECT file_id, MIN(pk) AS min_pk, MAX(pk) AS max_pk,
         |    MIN(sk) AS min_sk, MAX(sk) AS max_sk
         |  FROM zt GROUP BY file_id),
         |lt AS (SELECT pk, sk,
         |    ntile($ZFiles) OVER (ORDER BY pk, sk) AS file_id FROM keyed),
         |lm AS (SELECT file_id, MIN(pk) AS min_pk, MAX(pk) AS max_pk,
         |    MIN(sk) AS min_sk, MAX(sk) AS max_sk
         |  FROM lt GROUP BY file_id)
         |SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zm) AS n_files,
         |  (SELECT CAST(SUM(CASE WHEN max_pk >= plo AND min_pk <= phi
         |     AND max_sk >= slo AND min_sk <= shi THEN 1 ELSE 0 END)
         |     AS BIGINT) FROM zm, bounds) AS z_pk_box,
         |  (SELECT CAST(SUM(CASE WHEN max_sk >= slo AND min_sk <= shi
         |     THEN 1 ELSE 0 END) AS BIGINT) FROM zm, bounds) AS z_sk_only,
         |  (SELECT CAST(SUM(CASE WHEN max_pk >= plo AND min_pk <= phi
         |     AND max_sk >= slo AND min_sk <= shi THEN 1 ELSE 0 END)
         |     AS BIGINT) FROM lm, bounds) AS lin_pk_box,
         |  (SELECT CAST(SUM(CASE WHEN max_sk >= slo AND min_sk <= shi
         |     THEN 1 ELSE 0 END) AS BIGINT) FROM lm, bounds)
         |    AS lin_sk_only""".stripMargin
  )
}
