package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-mitigation helpers for hot aggregation keys.
  *
  * AQE handles skewed *joins* at runtime; skewed *aggregations* on a hot key
  * (one key holding a large share of a 100 TB table) still funnel that key's
  * partial rows into a single reducer. Salted two-phase aggregation spreads
  * the hot key over `buckets` reducers in phase one and merges the tiny
  * per-salt partials in phase two. Sums go through exact decimal
  * (graft.Exprs policy) so the result is bit-identical to the unsalted plan
  * regardless of how rows land in salt buckets.
  */
object Skew {

  /** Deterministic-result salted sum+count per key. The salt spreads rows
    * uniformly (hash of a row id expression supplied by the caller — any
    * per-row-distinct column works); correctness does not depend on the
    * spread, only balance does. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      rowId: Column, buckets: Int): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(xxhash64(rowId), lit(buckets)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(sum(graft.Exprs.dec(value)).as("_psum"),
        count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col("key"))
      .agg(sum(col("_psum")).cast(DoubleType).as("total"),
        sum(col("_pcnt")).as("n"))
  }

  /** One-pass, shuffle-free heavy-hitter profile of a key column: each
    * partition keeps a Misra–Gries summary of at most `k` counters
    * (Misra & Gries, "Finding Repeated Elements", Sci. Comput. Program.
    * 1982), the per-partition summaries are merged with the mergeable-
    * summaries rule (sum counts, subtract the (k+1)-largest, drop ≤ 0 —
    * Agarwal et al., "Mergeable Summaries", PODS 2012), preserving the
    * ε = n/k guarantee end to end.
    *
    * Contract: the result CONTAINS every key whose true frequency
    * exceeds n/k, and each reported `count_lb` is a lower bound within
    * n/k of the true count. Only O(partitions · k) tiny (key, count)
    * pairs ever leave the executors — the way to ask "which sources
    * dominate this 100 TB corpus" without paying a full groupBy
    * shuffle. Exact counts for the (few) surfaced keys can then be a
    * cheap second pass with an `isin` pushdown filter. */
  def frequentKeys(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(key.cast(StringType).as("key"))
      .as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap[String, Long]()
        it.foreach { v =>
          if (counters.contains(v)) counters(v) += 1L
          else if (counters.size < k) counters(v) = 1L
          else {
            // decrement step: every counter drops by 1, zeros evicted
            val dead = List.newBuilder[String]
            counters.keysIterator.foreach { kk =>
              val c = counters(kk) - 1L
              if (c == 0L) dead += kk else counters(kk) = c
            }
            dead.result().foreach(counters.remove)
          }
        }
        counters.iterator.map { case (kk, c) => (kk, c) }
      }
      .collect() // ≤ partitions·k summary entries — metadata, not data
    val merged = scala.collection.mutable.HashMap[String, Long]()
    partials.foreach { case (kk, c) => merged(kk) = merged.getOrElse(kk, 0L) + c }
    val out =
      if (merged.size <= k) merged.toSeq
      else {
        val sorted = merged.values.toArray.sorted(Ordering[Long].reverse)
        val cut = sorted(k) // (k+1)-largest count
        merged.toSeq.map { case (kk, c) => (kk, c - cut) }
          .filter(_._2 > 0L)
      }
    out.sortBy { case (kk, c) => (-c, kk) }
      .toDF("key", "count_lb")
  }

  /** K-minimum-values distinct-count sketch per group (Bar-Yossef et al.
    * 2002; the (k−1)/U_(k) estimator of Beyer et al., SIGMOD 2007): keep
    * each group's k smallest DISTINCT hash draws; when a group holds ≥ k
    * draws the estimate is `(k−1)·2³² div kth-smallest-draw`, otherwise
    * the draw count IS the cardinality (the sketch is exact below k).
    * The draw is the engine's md5-prefix recipe — 32-bit uniform and
    * reproducible in DuckDB — and the estimator is pure integer
    * cross-multiplication, so the ESTIMATE itself is oracle-checkable
    * bit-for-bit. (Spark's BUILT-IN approx_count_distinct HLL++ keeps
    * engine-private buffers and can never share an oracle; the suite's
    * own [[hllDistinctSketch]] fixes that by DEFINING the register
    * layout.) Relative error ≈ 1/√(k−2).
    *
    * Scale shape: the sketch is the mergeable-summaries answer to
    * "distinct per group" at 100 TB — per-partition k-min sets union and
    * re-take the k smallest (merge = min-union, associative and
    * order-free), so only O(groups · k) draws ever shuffle; the
    * `distinct + window` formulation here lets Catalyst run exactly that
    * partial-aggregate plan. The exact `count_distinct` column rides
    * along for the error report — a monitor calibrating the sketch at
    * gate scale; at deployment scale you drop it (paying it IS the full
    * distinct shuffle the sketch exists to avoid). */
  def kmvDistinct(df: DataFrame, group: String, value: Column,
      k: Int): DataFrame = {
    // calibration monitor: the sketch estimate joined against the exact
    // count — gate-scale only; the exact column pays the full distinct
    // shuffle the sketch exists to avoid, so deployment uses
    // [[kmvDistinctSketch]] instead
    val nn = df.filter(value.isNotNull)
    val ex = nn.groupBy(col(group))
      .agg(count_distinct(value).as("n_exact"))
    ex.join(kmvDistinctSketch(df, group, value, k), Seq(group))
      .select(col(group), col("n_exact"), col("est_distinct"))
      .withColumn("err_permille",
        expr("abs(est_distinct - n_exact) * 1000L div n_exact"))
  }

  /** Sketch-only KMV estimate per group — the deployment entry point: no
    * exact-count calibration column, so the plan never pays a full
    * per-group distinct shuffle; only O(groups · k) minimum draws move
    * (partial TOP-k per partition via the distinct + window formulation,
    * merged by min-union). Same estimator, bit-identical `est_distinct`
    * to the calibrated monitor. */
  /** The engine's per-group distinct KMV draws — ONE definition of the
    * null-skip, the `kmv:` md5-prefix draw and the distinct, shared by
    * the cardinality sketch and the overlap algebra (the cross-operator
    * invariant "pair union estimate = sketch of the merged group" is
    * only sound while both consume the same draws).
    *
    * NULL values are excluded from the universe up front (defined
    * semantics, matching COUNT(DISTINCT)'s null-skip): a NULL draw
    * would sort FIRST in Spark's window but LAST in DuckDB's, silently
    * diverging the kth pick — and a group with only NULLs would divide
    * by its zero exact count. Such a group simply has no row. */
  private def kmvDraws(df: DataFrame, group: String,
      value: Column): DataFrame = {
    val u = conv(
      substring(md5(concat(lit("kmv:"), value.cast(StringType))), 1, 8),
      16, 10).cast(LongType)
    df.filter(value.isNotNull)
      .select(col(group).as("g"), u.as("u")).distinct()
  }

  def kmvDistinctSketch(df: DataFrame, group: String, value: Column,
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    import org.apache.spark.sql.expressions.Window
    val draws = kmvDraws(df, group, value).withColumnRenamed("g", group)
    val w = Window.partitionBy(col(group)).orderBy(col("u"))
    val kth = draws.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col(group), col("u").as("kth_u"))
    val nd = draws.groupBy(col(group)).agg(count(lit(1)).as("n_draws"))
    nd.join(kth, Seq(group), "left")
      .select(col(group),
        when(col("kth_u").isNull, col("n_draws"))
          .otherwise(expr(
            s"CAST(${k - 1} AS BIGINT) * 4294967296L div greatest(kth_u, 1L)"))
          .as("est_distinct"))
  }

  /** KMV set algebra: pairwise union / intersection / Jaccard estimates
    * for every group pair, FROM THE SKETCHES ALONE (Beyer et al., SIGMOD
    * 2007 §5): the k-min sketch of A ∪ B is the k smallest of
    * S_A ∪ S_B (min-union merge — the mergeable-summaries property this
    * operator exists to demonstrate), ρ = |union-k ∩ S_A ∩ S_B| / k
    * estimates the Jaccard similarity, and |A∩B| ≈ ρ · est(|A∪B|). Every
    * output is integer arithmetic on the engine's md5-prefix draws
    * (ρ as `rho_num`/k, Jaccard in permille, the intersection estimate
    * via integer div), so the estimates are oracle-checkable
    * bit-for-bit, like the underlying [[kmvDistinctSketch]].
    *
    * Scale shape: after the per-group sketch pass (O(groups·k) rows — the
    * only stage that touches data), the pair algebra runs on sketch rows
    * only: groups² · 2k tiny rows, never the corpus. This is the shape of
    * "overlap matrix across N corpus shards / crawl snapshots" at 100 TB:
    * sketch once per shard, estimate all O(N²) overlaps for free.
    * A pair with fewer than k union draws is EXACT (its union sketch is
    * the whole hashed union — the denominator `least(k, n_union)` makes
    * the estimator collapse to the true hashed-set Jaccard). */
  def kmvOverlap(df: DataFrame, group: String, value: Column,
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    import org.apache.spark.sql.expressions.Window
    val draws = kmvDraws(df, group, value)
    val wg = Window.partitionBy(col("g")).orderBy(col("u"))
    val sk = draws.withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= k).select(col("g"), col("u"))
    // group-vocabulary × group-vocabulary: bounded by the number of
    // distinct sources at any corpus size — hint both stages (the pair
    // frame and its joins against the k·groups sketch rows below are all
    // sketch-sized; without hints the estimate-blind planner degrades the
    // cross to a CartesianProductExec in the nothing-auto-broadcasts
    // regime, i.e. at real scale)
    val pairs = sk.select(col("g").as("src_a")).distinct()
      .crossJoin(broadcast(sk.select(col("g").as("src_b")).distinct()))
      .filter(col("src_a") < col("src_b"))
    val ua = pairs.join(sk.withColumnRenamed("g", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("u"),
        lit(1L).as("ia"), lit(0L).as("ib"))
    val ub = pairs.join(sk.withColumnRenamed("g", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("u"),
        lit(0L).as("ia"), lit(1L).as("ib"))
    // the min-union merge: distinct union draws with membership flags
    val uni = ua.unionByName(ub)
      .groupBy(col("src_a"), col("src_b"), col("u"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val wp = Window.partitionBy(col("src_a"), col("src_b"))
      .orderBy(col("u"))
    val ranked = uni.withColumn("rn", row_number().over(wp))
    ranked.groupBy(col("src_a"), col("src_b"))
      .agg(
        count(lit(1)).as("n_union_draws"),
        max(when(col("rn") === k, col("u"))).as("kth_u"),
        sum(when(col("rn") <= k, col("ia") * col("ib"))
          .otherwise(lit(0L))).as("rho_num"))
      .select(col("src_a"), col("src_b"),
        when(col("kth_u").isNull, col("n_union_draws"))
          .otherwise(expr(
            s"CAST(${k - 1} AS BIGINT) * 4294967296L div greatest(kth_u, 1L)"))
          .as("est_union"),
        col("rho_num"),
        least(lit(k.toLong), col("n_union_draws")).as("m"))
      .withColumn("est_intersect", expr("rho_num * est_union div m"))
      .withColumn("jaccard_permille", expr("rho_num * 1000L div m"))
      .drop("m")
  }

  /** HyperLogLog register count (m = 2^9) and the estimator's frozen
    * bias constant α_m = 0.7213/(1 + 1.079/m), fixed in parts-per-million
    * so both engines run the SAME integer numerator — the ppm constant is
    * the spec, not a rounding of it. Relative error ≈ 1.04/√m ≈ 4.6%. */
  private[graft] val HllRegisters = 512
  private[graft] val HllAlphaPpm = 719783L
  /** α_ppm · m² · 2^52 — the raw-estimator numerator, 27 digits (fits
    * DECIMAL(38,0)/HUGEINT): est_raw = NUM div sum_scaled div 10^6. */
  private[graft] val HllNumerator = "849769778534840460212436992"

  /** HyperLogLog distinct-count sketch per group (Flajolet et al., AofA
    * 2007), with an engine-DEFINED register layout so the estimate is
    * oracle-replayable bit-for-bit — the property Spark's built-in
    * `approx_count_distinct` (engine-private HLL++ buffers) cannot give:
    * the 60-bit md5-prefix draw splits into a 9-bit register index and a
    * 51-bit remainder; ρ = 52 − bitlen(remainder) (leading zeros + 1,
    * ρ = 52 when the remainder is 0); each register keeps max ρ. The
    * register digest is folded to integers — `v_zero` (empty registers)
    * and `sum_scaled` = Σ_j 2^(52−M_j) (the harmonic sum scaled by 2^52,
    * ≤ m·2^52 = 2^61) — and the raw estimate α_m·m²/Σ2^−M_j becomes the
    * pure integer chain [[HllNumerator]] div sum_scaled div 10^6
    * (DECIMAL(38,0)/HUGEINT; floor-of-floor equals the single floor).
    * Below 2.5m with empty registers the standard linear-counting branch
    * `floor(m·ln(m/V))` applies — the one non-integer step, inside the
    * suite's documented ln ulp-tolerance class (BASELINE.md): a cell
    * shift needs m·ln(m/V) within an ulp of an integer, which no gate
    * value approaches. No 32-bit large-range correction is needed: the
    * draw is 60-bit, so hash saturation sits far beyond any real scale.
    *
    * Scale shape: the per-(group, register) MAX is a partial aggregate —
    * map-side combine leaves O(groups · m) tiny rows to shuffle, and the
    * merge rule is elementwise register max (associative, order-free,
    * idempotent — the HLL union is EXACT, unlike KMV's min-union which
    * is exact only below k). Unlike KMV the chain needs no DISTINCT
    * anywhere: duplicates cannot move a max. The fixed m·6-bit register
    * state (≈ 384 bytes/group) is the smallest mergeable distinct
    * summary in the suite's kit. */
  def hllDistinctSketch(df: DataFrame, group: String,
      value: Column): DataFrame =
    hllFromRegisters(hllRegisters(df, group, value), group)

  /** The sketch STATE: per-(group, register) max ρ — the frame that
    * merges across shards/batches by elementwise register MAX (exact
    * union). Kept separate from the estimator so consumers (merge spec,
    * incremental maintenance) operate on the state the 100 TB contract
    * actually ships. */
  private[graft] def hllRegisters(df: DataFrame, group: String,
      value: Column): DataFrame = {
    // NULLs leave the universe up front, matching COUNT(DISTINCT) and the
    // KMV contract (an all-NULL group has no row).
    val nn = df.filter(value.isNotNull)
    val h = conv(
      substring(md5(concat(lit("hll:"), value.cast(StringType))), 1, 15),
      16, 10).cast(LongType)
    nn.select(col(group), h.as("hv"))
      .select(col(group),
        expr("hv div 2251799813685248L").as("reg"), // top 9 of 60 bits
        expr("hv % 2251799813685248L").as("rem"))
      .select(col(group), col("reg"),
        when(col("rem") === 0L, lit(52))
          .otherwise(lit(52) - length(conv(col("rem"), 10, 2)))
          .cast(IntegerType).as("rho"))
      .groupBy(col(group), col("reg"))
      .agg(max(col("rho")).as("mj"))
  }

  /** Digest + estimator over a [[hllRegisters]] state frame. */
  private[graft] def hllFromRegisters(regs: DataFrame,
      group: String): DataFrame = {
    val m = HllRegisters
    regs.groupBy(col(group))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(1L, 52 - mj)")).as("sum_present"))
      .select(col(group),
        (lit(m.toLong) - col("n_regs")).as("v_zero"),
        (col("sum_present") +
          (lit(m.toLong) - col("n_regs")) * lit(4503599627370496L))
          .as("sum_scaled"))
      .withColumn("est_raw", expr(
        s"CAST('$HllNumerator' AS DECIMAL(38,0)) div sum_scaled div 1000000"))
      .withColumn("est_distinct",
        when(col("v_zero") > 0L && col("est_raw") <= lit(5L * m / 2),
          floor(lit(m) * log(lit(m.toDouble) / col("v_zero"))))
          .otherwise(col("est_raw")))
      .select(col(group), col("v_zero"), col("sum_scaled"),
        col("est_distinct"))
  }

  /** Calibrated HLL monitor — [[hllDistinctSketch]] joined against the
    * exact per-group COUNT(DISTINCT), gate-scale only (the exact column
    * pays the full distinct shuffle the sketch exists to avoid; at
    * deployment scale use the sketch entry point). */
  def hllDistinct(df: DataFrame, group: String, value: Column): DataFrame = {
    val nn = df.filter(value.isNotNull)
    val ex = nn.groupBy(col(group))
      .agg(count_distinct(value).as("n_exact"))
    ex.join(hllDistinctSketch(df, group, value), Seq(group))
      .select(col(group), col("n_exact"), col("v_zero"),
        col("sum_scaled"), col("est_distinct"))
      .withColumn("err_permille",
        expr("abs(est_distinct - n_exact) * 1000L div n_exact"))
  }

  /** The exact second pass behind [[frequentKeys]]: true counts for the
    * (few) surfaced candidate keys. The `isin` membership predicate
    * reaches the parquet scan as a pushed filter (PlanSpec-pinned), so
    * the pass reads only row groups that can contain a candidate —
    * sketch first, then pay exact cost only for the shortlist. */
  def exactCountsFor(df: DataFrame, key: Column,
      candidates: Seq[String]): DataFrame =
    df.select(key.cast(StringType).as("key"))
      .filter(col("key").isin(candidates: _*))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"))

  /** Typed hot-key membership predicate shared by the differentiated-join
    * variants: literals retyped to the key column's own type (a
    * cast-to-string In() would wrap the column and never push to the
    * parquet scan), string comparison as the exotic-type fallback. A
    * NULL surfaced by the MG pass (a null-dominated key column) is
    * dropped — a NULL key can never equi-match, so both the plain join
    * and every slice discard those rows identically. */
  private def hotPredicate(keyed: DataFrame, key: Column,
      hot: Seq[String]): Column => Column = {
    val nn = hot.filter(_ != null)
    val typed: Option[Seq[Any]] =
      keyed.select(key).schema.head.dataType match {
        case LongType => Some(nn.map(_.toLong))
        case IntegerType => Some(nn.map(_.toInt))
        case ShortType => Some(nn.map(_.toShort))
        case StringType => Some(nn)
        case _ => None
      }
    typed match {
      case Some(vs) => c => c.isin(vs: _*)
      case None => c => c.cast(StringType).isin(nn: _*)
    }
  }

  /** Hot-key differentiated equi join — the JOIN-side companion of
    * [[saltedSumCount]]. AQE's skew handling splits oversized partitions
    * at runtime, but only within shuffle-join stages it already planned,
    * after the skewed map output exists — and only past its size
    * threshold (256 MB default), which a measured 90%%-hot corpus never
    * crossed (BASELINE.md "Skew-join guard, measured"); a PLANNED split
    * avoids ever materializing the hot keys' shuffle blocks and needs no
    * tuning. A shuffle-free [[frequentKeys]] pass surfaces the ≤ `k`
    * heaviest fact keys; fact rows on those keys join against a
    * BROADCAST of the dimension's matching rows — ≤ `k` dim rows for a
    * keyed dimension, always broadcastable no matter how hot the fact
    * side is, so the hot rows never shuffle at all — while the cold
    * remainder takes the ordinary shuffle join against the hot-filtered
    * dim (cold fact keys are disjoint from the hot set, so dropping the
    * hot dim rows from that branch changes nothing but the shuffle).
    * For a many-rows-per-key right side, broadcast stops being free —
    * use [[saltReplicatedJoin]].
    *
    * The split is SEMANTICALLY INVISIBLE: every row meets the same join
    * partners on either route, so the result equals the plain join no
    * matter WHICH keys MG happens to surface — the oracle pins exactly
    * that, the a11 discipline. The MG hot set is partition-order
    * dependent (lower bounds); by the same invariance that is harmless. */
  /** Memoized hot-key harvest behind the guarded joins. frequentKeys is
    * an EAGER action (mapPartitions + a bounded collect) — merely
    * CONSTRUCTING a guarded-join DataFrame runs a cluster job, which
    * surprised the r12 suite sweep (every plan-walk paid a scan per
    * construction; ADVICE r12). Memoize per (analyzed-plan fingerprint,
    * canonicalized key expression, k) the way IndexStore caches artifacts:
    * repeat constructions over the same input reuse the harvested set.
    * The cache is correctness-neutral by the split-invisibility contract
    * (ANY hot set yields the same join result), so even a stale entry
    * after an input overwrite only shifts WHICH keys broadcast. Bounded
    * at 64 entries (cleared wholesale — key churn means test fixtures,
    * not production reuse). */
  private val hotCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int),
      Seq[String]]()
  private def hotKeysOf(fact: DataFrame, factKey: Column, k: Int)
      : Seq[String] = {
    val ck = (fact.queryExecution.analyzed.semanticHash(),
      factKey.toString, k)
    if (hotCache.size > 64) hotCache.clear()
    hotCache.computeIfAbsent(ck, _ =>
      frequentKeys(fact, factKey, k)
        .select(col("key")).collect().map(_.getString(0)).toSeq)
  }

  /** NOTE: unless `hotKeys` is supplied, CONSTRUCTING this join runs the
    * (memoized) frequentKeys scan eagerly — see [[hotKeysOf]]. */
  def skewGuardedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, k: Int,
      hotKeys: Option[Seq[String]] = None): DataFrame = {
    val hot = hotKeys.getOrElse(hotKeysOf(fact, factKey, k))
      .filter(_ != null)
    if (hot.isEmpty) fact.join(dim, factKey === dimKey)
    else {
      val isHot = hotPredicate(fact, factKey, hot)
      val hotSlice = fact.filter(isHot(factKey))
        .join(broadcast(dim.filter(isHot(dimKey))), factKey === dimKey)
      val coldSlice = fact.filter(!isHot(factKey))
        .join(dim.filter(!isHot(dimKey)), factKey === dimKey)
      hotSlice.unionByName(coldSlice)
    }
  }

  /** The salt-replication variant of [[skewGuardedJoin]] for the case its
    * scaladoc flags: a MANY-rows-per-key right side, where broadcasting
    * even the hot slice stops being free. Hot fact rows take a
    * deterministic salt (hash of the caller's per-row-distinct `rowId`,
    * the [[saltedSumCount]] convention); the hot DIM rows replicate once
    * per salt value; the hot join runs on (key, salt), spreading each hot
    * key over `buckets` reducers with every fact row still meeting every
    * matching dim row EXACTLY once (one salt per fact row × one replica
    * per salt). The cold remainder joins the hot-FILTERED dim — in this
    * variant's very premise the hot dim rows are the bulk of the table,
    * and unfiltered they would shuffle a second time into a branch where
    * no cold fact row can match them. Semantically invisible like the
    * broadcast variant — the result equals the unsplit join for ANY salt
    * assignment, which is what the spec pins.
    *
    * NOTE: unless `hotKeys` is supplied, CONSTRUCTING this join runs the
    * (memoized) frequentKeys scan eagerly — see [[hotKeysOf]]. */
  def saltReplicatedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, rowId: Column, k: Int, buckets: Int,
      hotKeys: Option[Seq[String]] = None): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    // the working salt columns must not shadow caller columns — a
    // collision would make the post-join drop() remove caller data and
    // silently break the equals-the-unsplit-join contract
    require(!fact.columns.contains("_fsalt") &&
      !dim.columns.contains("_dsalt"),
      "fact/_fsalt or dim/_dsalt column collision")
    val hot = hotKeys.getOrElse(hotKeysOf(fact, factKey, k))
      .filter(_ != null)
    if (hot.isEmpty) fact.join(dim, factKey === dimKey)
    else {
      val isHot = hotPredicate(fact, factKey, hot)
      val salted = fact.filter(isHot(factKey))
        .withColumn("_fsalt", pmod(xxhash64(rowId), lit(buckets.toLong)))
      val replicated = dim.filter(isHot(dimKey))
        .withColumn("_dsalt",
          explode(sequence(lit(0L), lit(buckets - 1L))))
      val hotSlice = salted
        .join(replicated,
          factKey === dimKey && col("_fsalt") === col("_dsalt"))
        .drop("_fsalt", "_dsalt")
      val coldSlice = fact.filter(!isHot(factKey))
        .join(dim.filter(!isHot(dimKey)), factKey === dimKey)
      hotSlice.unionByName(coldSlice)
    }
  }
}
