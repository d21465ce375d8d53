package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the minhash hash material of a shingle —
  * `md5('0:'||s) || md5('1:'||s) || md5('2:'||s) || md5('3:'||s)` as 128
  * lowercase-hex chars, byte-identical to the built-in formulation (and the
  * DuckDB oracle SQL) but computed with ONE thread-local MessageDigest and
  * no intermediate concat/hex-string allocations. The built-in version pays
  * four `MessageDigest.getInstance` setups plus four prefix-concat
  * allocations per shingle, and the shingle stream is the widest point of
  * the MinHash pipeline (every document × every shingle). */
case class Md5x4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "md5x4"

  override def nullSafeEval(s: Any): Any =
    Md5x4Impl.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.Md5x4Impl.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Md5x4 =
    copy(child = newChild)
}

object Md5x4Impl {
  private val Hex = "0123456789abcdef".getBytes
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): UTF8String = {
    val md = localMd.get()
    val in = s.getBytes
    val out = new Array[Byte](128)
    var j = 0
    while (j < 4) {
      md.reset()
      md.update(('0' + j).toByte)
      md.update(':'.toByte)
      md.update(in)
      val dig = md.digest()
      var k = 0
      while (k < 16) {
        out(j * 32 + 2 * k) = Hex((dig(k) >> 4) & 0xf)
        out(j * 32 + 2 * k + 1) = Hex(dig(k) & 0xf)
        k += 1
      }
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
