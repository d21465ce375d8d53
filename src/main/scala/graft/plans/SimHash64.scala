package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash over an array of md5 hex
  * strings (one per token), returned as a 64-char '0'/'1' bit string.
  *
  * Semantics (identical to the DuckDB oracle's SQL formulation): bit i is
  * '1' iff the sum over tokens of (bit_i(md5(token)) * 2 - 1) is positive,
  * where bit_i reads the hex digits MSB-first. The md5 itself stays a
  * built-in (codegen'd); this expression replaces the 64-step higher-order
  * `aggregate` majority vote, which interpreted at ~0.8 ms per document —
  * the single hottest expression in the dedup pipeline. The native loop is
  * a per-document O(tokens × 64) byte walk inside whole-stage codegen. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(arr: Any): Any =
    SimHash64Impl.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SimHash64Impl.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64Impl {
  /** Hex digit value; accepts both cases (md5 emits lowercase, but the
    * function is registered session-wide and callers may pass uppercase). */
  private def hexVal(b: Byte): Int =
    if (b <= '9') b - '0'
    else if (b >= 'a') b - 'a' + 10
    else b - 'A' + 10

  def compute(hashes: ArrayData): UTF8String = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val bytes = hashes.getUTF8String(t).getBytes
        if (bytes.length >= 16) {
          var i = 0
          while (i < 64) {
            val d = hexVal(bytes(i >> 2))
            val bit = (d >> (3 - (i & 3))) & 1
            counts(i) += bit * 2 - 1
            i += 1
          }
        }
      }
      t += 1
    }
    val out = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      out(i) = if (counts(i) > 0) '1' else '0'
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
