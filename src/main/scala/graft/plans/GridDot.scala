package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: EXACT dot product of two `array<long>`
  * grid vectors, returned as the one correctly-rounded double the exact
  * integer sum maps to.
  *
  * This is the verification-grade kernel of every exact-grid ANN path
  * (IVF training/serving, PQ codebooks, recall monitor): the HOF
  * formulation `aggregate(zip_with(a,b,*), 0 :: DECIMAL(38,0), +)` it
  * replaces allocates a zipped array and a Decimal per element inside a
  * non-codegen lambda fold — measured as the dominant cost of the Lloyd
  * iterations. Here the products (exact: grid values < 2^31, products
  * < 2^62) accumulate in a plain long, promoted to BigInteger only on
  * actual overflow (possible past ~8 max-magnitude terms, rare on real
  * vectors), and the final conversion goes through
  * `java.math.BigDecimal.doubleValue` — the SAME rounding Spark's
  * `Decimal.toDouble` cast performs — so results are bit-identical to
  * the decimal fold on every input, overflowing or not (spec-pinned
  * against the HOF reference including forced-overflow vectors).
  * Mismatched lengths use the shorter prefix; null elements count as 0
  * (grid vectors are non-null by construction). */
case class GridDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "grid_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    GridDotImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.GridDotImpl.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GridDot =
    copy(left = newLeft, right = newRight)
}

object GridDotImpl {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var big: java.math.BigInteger = null
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val p = a.getLong(i) * b.getLong(i)
        val s = acc + p
        // signed-overflow test (Math.addExact's check, no exception):
        // overflow iff the addends share a sign the sum lost
        if (((acc ^ s) & (p ^ s)) < 0L) {
          big = (if (big == null) java.math.BigInteger.valueOf(acc)
                 else big.add(java.math.BigInteger.valueOf(acc)))
          acc = p
        } else acc = s
      }
      i += 1
    }
    if (big == null) acc.toDouble
    else new java.math.BigDecimal(big.add(java.math.BigInteger.valueOf(acc)))
      .doubleValue()
  }
}
