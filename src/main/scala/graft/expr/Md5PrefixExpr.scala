package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[Md5Prefix]]: first `nHex` hex digits of the md5
  * digest as a long — the same value as
  * `conv(substring(md5(s), 1, nHex), 16, 10)` but without materializing
  * the 32-char hex string or re-parsing it (one digest + a nibble loop).
  * MessageDigest instances are pooled per thread (they are not
  * thread-safe and allocation is measurable at millions of rows). */
object Md5Ops {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def md5Prefix(s: UTF8String, nHex: Int): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var k = 0
    while (k < nHex) {
      val b = dig(k / 2) & 0xff
      v = (v << 4) | (if (k % 2 == 0) b >>> 4 else b & 0xf)
      k += 1
    }
    v
  }
}

/** `md5_prefix(string, nHexDigits) -> long`: the engine-portable string
  * hash used by the dedup/LSH operators (see [[PortableHash]]) as a native
  * codegen expression. Bit-identical to the composed
  * `conv(substring(md5(s), 1, n), 16, 10)` formulation (both hash the
  * UTF-8 bytes), which remains the documented SQL twin for oracles; this
  * kernel exists because the composed chain hex-encodes 32 chars and
  * string-parses them back per row — pure overhead at millions of
  * shingles. `nHex` must be a foldable int in [1, 15] (≤60 bits keeps
  * signed-64 ANSI arithmetic safe downstream). */
case class Md5Prefix(child: Expression, nHex: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_prefix"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be STRING, got ${child.dataType.sql}")
    else if (nHex < 1 || nHex > 15)
      TypeCheckResult.TypeCheckFailure(s"$prettyName nHex must be in [1, 15], got $nHex")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    Md5Ops.md5Prefix(input.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Md5Ops.md5Prefix($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
