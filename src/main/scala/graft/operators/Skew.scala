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
}
