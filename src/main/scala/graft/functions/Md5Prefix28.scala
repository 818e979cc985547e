package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the engine's 28-bit base hash: the
 * integer value of the first 7 hex characters of md5(input) — i.e. the
 * top 28 bits of the digest.
 *
 * Semantically identical to `conv(substring(md5(x), 1, 7), 16, 10)` (the
 * portable form the DuckDB oracles replay), but evaluated in one codegen
 * call on the digest bytes: no hex-string materialization, no substring,
 * no base-conversion parse. This sits on the hottest pipeline path (one
 * call per shingle/token in MinHash, SimHash, and winnowing), which is
 * exactly where the brief's "custom Expression beats a UDF" preference
 * applies.
 */
case class Md5Prefix28(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5prefix28"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix28.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix28.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix28 =
    copy(child = newChild)
}

object Md5Prefix28 {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Top 28 bits of md5(UTF-8 bytes) — equals parsing the first 7 hex
   *  chars of the digest's hex form. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4))
  }
}
