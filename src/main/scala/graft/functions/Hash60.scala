package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native portable 60-bit hash: the first 15 hex digits of md5 as a long —
  * value-identical to the composed form
  * `conv(substr(md5(x),1,15),16,10) cast long` (and to DuckDB's
  * `('0x' || substr(md5(x),1,15))::BIGINT`, which the oracle SQL uses),
  * but one codegen'd call instead of a 4-expression chain that
  * materializes the 32-char hex string and re-parses it. Used on every
  * hashed hot path (minhash salting, fingerprints, chunk/frame features).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_hash60 expects string, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_hash60"
}

object Hash60 {
  // One digest instance per executor thread: `getInstance` does a provider
  // lookup + allocation per call, which erodes the codegen win on a
  // function that runs once per row on the hashed hot paths.
  private val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  // Reused digest output buffer: `digest()` allocates a fresh 16-byte array
  // per call, which at one call per character position (GramHash60) is pure
  // allocator pressure.
  private val out16: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))

  /** First 60 bits of md5(bytes): digest bytes 0..6 big-endian (56 bits)
    * followed by the high nibble of byte 7 — exactly the value of the first
    * 15 hex characters parsed base-16.
    */
  def hash(bytes: Array[Byte]): Long = hashRange(bytes, 0, bytes.length)

  /** Same hash over the slice `[off, off+len)` — no sub-array copy. */
  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = md5.get()
    m.reset()
    m.update(bytes, off, len)
    val d = out16.get()
    m.digest(d, 0, 16)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}
