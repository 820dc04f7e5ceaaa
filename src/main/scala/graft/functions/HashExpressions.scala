package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-prefix hash of a string — the portable shingle hash of the
  * dedup family, natively.
  *
  * Bit-for-bit equal to `conv(substr(md5(x), 1, 15), 16, 10)` (the first
  * 15 hex digits of the digest are exactly the top 60 bits of its first
  * 8 bytes), and therefore to the DuckDB oracle's
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` — but computed straight
  * from the digest bytes: no hex-string rendering, no substring, no
  * base-16 string parse. This sits inside the per-shingle lambda of the
  * MinHash sketch, so the saved allocations multiply by shingles × docs.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(s), as a non-negative long. */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top64 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top64 >>> 4
  }
}

/** HLL register rank, natively: rho = 53 − bitlength(w), computed as
  * clz64(w) − 11 — value-identical to the engine-portable SQL form
  * `53 - length(ltrim(bin(w), '0'))` the DuckDB oracle evaluates (for
  * EVERY long, including 0 → 53 and negatives → −11; property-spec'd),
  * but with no per-row binary-string rendering: one intrinsic inside
  * whole-stage codegen, zero allocations. Sits on the per-row hot path
  * of the B36 sketch, so the saved alloc multiplies by corpus rows.
  */
case class HllRho52(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long input, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "hll_rho52"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long]) - 11

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(java.lang.Long.numberOfLeadingZeros($c) - 11)")

  override protected def withNewChildInternal(newChild: Expression): HllRho52 =
    copy(child = newChild)
}

/** Column-level entry points for the native hash expressions. */
object HashFunctions {
  def md5Prefix60(c: Column): Column =
    GraftShims.column(Md5Prefix60(GraftShims.expression(c)))

  def hllRho52(c: Column): Column =
    GraftShims.column(HllRho52(GraftShims.expression(c)))
}
