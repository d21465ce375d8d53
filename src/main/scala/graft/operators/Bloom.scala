package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloom-filter membership sketch (Bloom, CACM 1970) with an
  * engine-defined, oracle-replayable layout — the sixth mergeable
  * summary next to Misra–Gries, KMV, sampled quantiles, CMS and HLL.
  *
  * Layout: `k` = [[BloomHashes]] independent md5-derived bit positions
  * per key (the suite's `'0x'||substr(md5(tag:key),1,8)` 32-bit uniform
  * draw, mod `m` = [[BloomBits]]), packed into 32-bit words carried as
  * BIGINT `(word, wval)` rows. Merge is bitwise OR (equivalently: union
  * of the distinct-bit sets), associative and duplicate-blind, so
  * per-partition partial filters union losslessly — the mergeable-
  * summaries contract. Spark's own `bloom_filter_agg` keeps an
  * engine-private serialized buffer and can never share a DuckDB
  * oracle; DEFINING the draw and the packing (as HLL does for its
  * registers) makes the filter itself bit-for-bit checkable.
  *
  * The deployment operator is [[bloomAntiJoin]]: an EXACT anti-join in
  * which the big probe side first tests a driver-bounded broadcast
  * bitset — a row-local expression, no shuffle — and only the (few)
  * bloom-positive candidates pay the shuffled `left_anti` recheck.
  * Bloom filters have no false negatives, so every pruned row is
  * definitely absent from the build side and the recheck absorbs the
  * false positives: the composition is semantically identical to the
  * plain anti-join (that plain anti-join IS the DuckDB oracle), the
  * bloom is purely a shuffle-pruning device. This is the reference's J4
  * work-queue scan ("documents not yet processed",
  * db/data.py:950-981) at the scale where the processed ledger no
  * longer broadcasts as a raw key set but its bitset does.
  *
  * Scale shape: building the filter shuffles at most `m` distinct bit
  * rows (partial-aggregated map-side); the packed words — `m/32` longs
  * — collect to the driver as bounded metadata (the [[Skew
  * .frequentKeys]] posture) and ship back as a literal array in the
  * probe expression. The gate fixture deliberately undersizes `m`
  * (2048 bits against ~190 build keys ⇒ a visible false-positive band,
  * the CMS-overcount-monitor precedent) so the recheck path is
  * exercised by the oracle itself; a deployment sizing targets
  * `m ≥ 10·k·n / ln 2` bits for sub-percent fp, and past the point
  * where `m/32` longs stop being driver metadata (~2^27 bits) this
  * layout hands over to Spark's native `bloomFilter`/DPP machinery,
  * trading oracle replay for unbounded size.
  */
object Bloom {

  /** Filter width in bits — 64 packed 32-bit words. Deliberately small
    * at gate scale; see the class doc for the deployment sizing rule. */
  private[graft] val BloomBits = 2048

  /** Independent hash functions per key. */
  private[graft] val BloomHashes = 3

  /** 2^j for j in 0..31 — bit masks as a literal lookup (integer-only;
    * avoids shiftleft's Int-literal-only signature and any double pow). */
  private val Pow2: Array[Long] = Array.tabulate(32)(j => 1L << j)

  /** The i-th md5-derived bit position of one key. */
  private def bloomCell(i: Int, key: Column, m: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"bloom$i:"), key)), 1, 8), 16, 10)
      .cast(LongType), lit(m.toLong))

  /** The k md5-derived bit positions of one key. */
  private[graft] def bloomCells(key: Column, m: Int = BloomBits,
      k: Int = BloomHashes): Column =
    array((0 until k).map(bloomCell(_, key, m)): _*)

  /** Distinct set-bit positions of a one-column `k` key frame — the
    * unpacked filter. At most `m` rows regardless of input size; the
    * distinct is a partial-aggregated shuffle of ≤ k·|keys| bit rows.
    * NULL keys contribute no bits (they can never equi-join, so an
    * anti-join build side loses nothing by dropping them — the same
    * null-skip the KMV sketches define). */
  def bloomBitSet(keys: DataFrame, m: Int = BloomBits,
      k: Int = BloomHashes): DataFrame =
    keys.filter(col("k").isNotNull)
      .select(explode(bloomCells(col("k"), m, k)).as("bit")).distinct()

  /** The packed `(word, wval, bits_in_word)` form — the sketch rows that
    * persist / merge (OR) / ship. `wval` = Σ 2^(bit mod 32) over the
    * word's distinct set bits: ≤ 2³²−1, exact in BIGINT on both engines. */
  def bloomWords(keys: DataFrame, m: Int = BloomBits,
      k: Int = BloomHashes): DataFrame = {
    val pw = typedLit(Pow2)
    bloomBitSet(keys, m, k)
      .groupBy(floor(col("bit") / 32).as("word"))
      .agg(sum(element_at(pw, pmod(col("bit"), lit(32L)).cast(IntegerType)
          + 1)).as("wval"),
        count(lit(1)).as("bits_in_word"))
  }

  /** Driver-side packed words of the build side: `m/32` longs — bounded
    * metadata (like a collected Misra–Gries summary), independent of the
    * build side's row count. */
  def collectWords(keys: DataFrame, m: Int = BloomBits,
      k: Int = BloomHashes): Array[Long] = {
    require(m % 32 == 0, "m must pack into 32-bit words")
    val words = new Array[Long](m / 32)
    bloomBitSet(keys, m, k).collect().foreach { r =>
      val bit = r.getLong(0)
      words((bit / 32).toInt) |= Pow2((bit % 32).toInt)
    }
    words
  }

  /** Row-local membership probe against a collected filter: true iff all
    * k of the key's bits are set (NULL key → NULL, like any equality
    * probe — callers that must route null-key rows pick a branch with
    * coalesce, as [[bloomAntiJoin]] does). No shuffle, no join — and the
    * k tests are unrolled as a plain conjunction of literal-array
    * lookups rather than a higher-order `forall`, so the probe is
    * ordinary codegen'd expression work inside the scan's
    * WholeStageCodegen span. The probe expands the packed words into an
    * m-entry boolean literal so each conjunct references its md5 cell
    * ONCE — FilterExec codegen does not CSE within a predicate tree, and
    * the word-index + mask formulation paid 2k md5 evaluations per row
    * where this pays k (md5 is the probe's hot operation). The packed
    * (word, wval) rows remain the persistence/merge format. */
  def mightContain(key: Column, words: Array[Long], m: Int = BloomBits,
      k: Int = BloomHashes): Column = {
    val bits: Array[Boolean] = Array.tabulate(m)(b =>
      (words(b / 32) & Pow2(b % 32)) != 0L)
    val bcol = typedLit(bits)
    (0 until k).map { i =>
      element_at(bcol, bloomCell(i, key, m).cast(IntegerType) + 1)
    }.reduce(_ && _)
  }

  /** Exact anti-join with bloom pre-pruning: rows of `left` whose
    * `leftKey` does not occur in `right.rightKey`. Bloom-negative rows
    * (no false negatives ⇒ definitely absent) pass through shuffle-free;
    * only bloom-positive candidates pay the exact `left_anti` recheck,
    * which removes true members and the false-positive band alike. */
  def bloomAntiJoin(left: DataFrame, leftKey: Column, right: DataFrame,
      rightKey: Column, m: Int = BloomBits, k: Int = BloomHashes)
      : DataFrame = {
    val rk = right.select(rightKey.as("k"))
    val words = collectWords(rk, m, k)
    // NULL-key left rows never equi-match, so the plain anti-join KEEPS
    // them — route the probe's NULL through the shuffle-free branch
    // (coalesce false), not into neither branch
    val cand = coalesce(mightContain(leftKey, words, m, k), lit(false))
    val definiteOut = left.filter(!cand)
    val recheck = left.filter(cand)
      .join(rk.distinct().withColumnRenamed("k", "_bloom_bk"),
        leftKey === col("_bloom_bk"), "left_anti")
    definiteOut.unionByName(recheck)
  }
}
