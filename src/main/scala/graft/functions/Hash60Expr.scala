package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 60-bit content hash:
  * numerically identical to `conv(substring(md5(x), 1, 15), 16, 10)` (the
  * value of the first 15 hex chars of the md5 digest), but computed
  * directly from the digest bytes — no hex string materialization, no
  * base-16 reparse — and codegen'd (`doGenCode`), so it fuses into
  * whole-stage codegen instead of a three-builtin chain. This is the hot
  * function of every dedup/LSH path (one call per token).
  *
  * The SQL-portable formulation stays available (and is what the DuckDB
  * oracle uses); values are bit-identical — see FunctionsSpec.
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}

object Hash60 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Top 60 bits of md5(bytes): bytes 0..6 followed by the high nibble of
    * byte 7 — exactly the integer value of the first 15 hex characters.
    * Digest lands in a thread-local buffer: this runs once per token in
    * the dedup hot loops, so the per-call 16-byte allocation shows up.
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes)
    val d = buffers.get()
    md.digest(d, 0, 16)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}
