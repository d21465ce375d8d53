package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector column functions over `array<float|double>` embeddings.
  *
  * Pure Catalyst higher-order expressions (`zip_with`/`aggregate`): the dot
  * product folds left-to-right in a fixed order, so results are
  * deterministic — no UDF, no driver round-trips, fully codegen-friendly.
  * Mirrors the reference's metric-vector math (reference:
  * similarity/metrics.py:33-96, similarity/index_model.py:226-244).
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> (all math is done in double). */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Dot product, accumulated in index order. Uses the engine's native
    * `vec_dot` expression (graft.plans.VecDot, a codegen'd primitive loop);
    * bit-identical to the higher-order-function fold
    * `aggregate(zip_with(a, b, *), 0.0, +)` it replaces. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Annoy-style angular distance: sqrt(2 * (1 - cos)) (reference:
    * similarity/index_model.py — Annoy 'angular' metric). */
  def angularDistance(a: Column, b: Column): Column =
    sqrt(lit(2.0) * (lit(1.0) - cosine(a, b)))

  /** Exponentially weighted copy of a vector: element i scaled by base^i
    * (reference F14: similarity/metrics.py:48-58, base 0.95). Guarded for
    * the empty vector: `sequence(0, -1)` defaults its step to -1 and yields
    * [0, -1], which zip_with would null-pad into [null, null] instead of
    * []. NULL input stays NULL (metric zero-fill guards key on vector
    * nullness). */
  def expWeighted(v: Column, base: Double): Column =
    when(size(v) > 0,
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x * pow(lit(base), i.cast(DoubleType))))
      .when(size(v) === 0, typedLit(Seq.empty[Double]))

  /** Raw 24-bit integers behind [[lshHyperplanes]]. Exposed so the DuckDB
    * oracle can regenerate the identical family from exact integer
    * literals: v/2²³ and the subsequent −1 are both exact in binary
    * (numerators stay below 2²⁴), so `CAST(v AS DOUBLE)/8388608.0 - 1.0`
    * reproduces each plane component bit-for-bit in any engine. */
  def lshHyperplaneInts(planes: Int, dim: Int): Seq[Seq[Long]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      (0 until dim).map { k =>
        val h = mdig.digest(s"$p:$k".getBytes("UTF-8"))
        ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
      }
    }
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH, derived from MD5
    * so every executor (and every engine) regenerates the identical family.
    * Returns `planes` unit-free vectors of dimension `dim` in [-1, 1). */
  def lshHyperplanes(planes: Int, dim: Int): Seq[Seq[Double]] =
    lshHyperplaneInts(planes, dim).map(_.map(v => v.toDouble / (1 << 23) - 1.0))

  /** Sign-LSH bucket key: one bit per hyperplane ('1' iff dot >= 0).
    * NULL vectors get a NULL key (dropped by the bucket equi-join), not the
    * all-zeros bucket — otherwise every NULL-embedding row would collide
    * into one giant spurious candidate bucket. */
  def lshBucket(v: Column, hyperplanes: Seq[Seq[Double]]): Column = {
    val bits = hyperplanes.map { h =>
      val dp = dot(v, typedLit(h))
      when(dp >= 0, lit("1")).when(dp < 0, lit("0")) // NULL stays NULL
    }
    concat(bits: _*)
  }
}
