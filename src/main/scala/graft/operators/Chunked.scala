package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The chunked two-level prefix decomposition shared by the scale-safe
  * rewrites of ev_concentration (exclusive prefix SUM over volume counts)
  * and w10_pareto_frontier (MAX over strictly-higher price levels): a
  * running aggregate over a value-ordered frame decomposes into a
  * PARTITIONED within-chunk window plus a cross-chunk combine over the
  * chunk rollup — no unpartitioned WindowExec anywhere.
  *
  * ONE definition of the two pieces every such rewrite needs, so a fix
  * propagates (review-caught in round 12: each hand-rolled copy had a
  * subtly different chunk-count bound):
  *
  *  - [[chunkId]] bounds the CHUNK COUNT itself. A fixed-divisor chunk
  *    (`v div 1024`) bounds chunk count only while the value DOMAIN is
  *    dense near zero — sparse values over a wide domain (prices spread
  *    across 2^40 cents) make the chunk frame itself data-sized and the
  *    cross-chunk triangle quadratic. Deriving the width from the
  *    OBSERVED range caps the frame at `maxChunks` rows for any domain.
  *  - [[crossChunk]] is the broadcast triangle: for each chunk, an
  *    aggregate over the chunk rollup rows satisfying `rel` (strictly
  *    lower for prefix sums, strictly higher for dominance maxes) — at
  *    most `maxChunks²` comparisons against a broadcast frame of at most
  *    `maxChunks` rows, both constants.
  */
object Chunked {

  /** Default chunk-count cap: 4096 keeps the triangle ≤ 16.7M comparisons
    * and the broadcast frame a few hundred KB — constants at any scale. */
  val MaxChunks = 4096

  /** Bounded chunk id of column `v` over the observed `[lo, hi]` range
    * (all three are COLUMN NAMES — the arithmetic must be integral `div`,
    * which the Column API does not expose): `(v − lo) div width` with
    * `width = max(1, (hi − lo) div maxChunks + 1)`, so the id lands in
    * `[0, maxChunks]` for ANY value domain and stays monotone in `v`
    * (the property the within-chunk/cross-chunk split relies on).
    * `lo`/`hi` normally come from a broadcast one-row min/max aggregate
    * (the a14_histogram pattern — exchange reuse shares the underlying
    * rollup with the main branch). */
  def chunkId(v: String, lo: String, hi: String,
      maxChunks: Int = MaxChunks): Column = {
    // The names are interpolated into expr() (the string path is the only
    // way to reach integral `div`), so anything needing backtick quoting
    // (spaces, dots, reserved words) would parse wrong or resolve against
    // another column, failing as a far-away AnalysisException — reject it
    // HERE instead (ADVICE r12).
    for (n <- Seq(v, lo, hi))
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"chunkId needs simple identifier column names, got '$n'")
    expr(s"($v - $lo) div " +
      s"greatest(1L, ($hi - $lo) div ${maxChunks}L + 1L)")
  }

  /** The cross-chunk combine: for every row of `chunkAgg` (one row per
    * chunk), aggregate `valCol` over the OTHER chunks satisfying
    * `rel(other, this)`. Left join keeps chunks with no qualifying
    * other-chunk (the caller's aggregate sees null — coalesce or
    * null-skipping `greatest` handles the edge). The right side
    * broadcasts: it is the ≤ maxChunks-row rollup, never data. */
  def crossChunk(chunkAgg: DataFrame, chunkCol: String, valCol: String,
      rel: (Column, Column) => Column, agg: Column => Column,
      outCol: String): DataFrame =
    chunkAgg.as("a")
      .join(broadcast(chunkAgg.as("b")),
        rel(col(s"b.$chunkCol"), col(s"a.$chunkCol")), "left")
      .groupBy(col(s"a.$chunkCol").as(chunkCol))
      .agg(agg(col(s"b.$valCol")).as(outCol))
}
