package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: parse 8 hex chars of a string starting at a
  * 0-based byte offset into a long (value in [0, 2³²)).
  *
  * `hex32(h, off)` ≡ `conv(substring(h, off+1, 8), 16, 10) :: long`, but a
  * bare byte loop instead of `conv`'s generic radix machinery — the latter
  * measurably dominated when used as the minhash aggregate input (16 parses
  * per shingle row). Parsing the slices to longs lets the 16 `min`s run as
  * a codegen'd fixed-width HashAggregate instead of min(string)'s
  * interpreted SortAggregate. Tolerates both hex cases; returns null for
  * out-of-range offsets. */
case class Hex32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hex32"
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any, off: Any): Any = {
    val r = Hex32Impl.parse(s.asInstanceOf[UTF8String], off.asInstanceOf[Int])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, off) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.plans.Hex32Impl.parse($s, $off);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hex32 =
    copy(left = newLeft, right = newRight)
}

object Hex32Impl {
  /** Returns the parsed value, or -1 for out-of-range/non-hex input. */
  def parse(s: UTF8String, off: Int): Long = {
    val b = s.getBytes
    if (off < 0 || off + 8 > b.length) return -1L
    var v = 0L
    var i = off
    val end = off + 8
    while (i < end) {
      val c = b(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1L
      v = (v << 4) | d
      i += 1
    }
    v
  }
}
