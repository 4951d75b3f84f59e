package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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

/** Per-position hash60 values of a token array's space-joined word
  * `n`-grams: element i-1 (0-based i) = hash60(toks[i] + " " + ... +
  * toks[i+n-1]) — value-identical to the built-ins spelling
  * `hash60(concat_ws(" ", slice(toks, i, n)))` (parity property-pinned),
  * but one generated call per document with zero gram-string allocation
  * (each token's bytes stream into the digest in place). Empty for
  * documents shorter than `n` tokens — the wordNgrams contract. The word
  * face of [[GramHash60]]'s char-gram stream; feeds the span-dedup family
  * (q87/q90/s18), where md5-per-gram over interpreted concat was the
  * dominant cost.
  */
case class WordGramHash60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_word_gram_hash60 expects (array<string>, int), got $l / $r")
  }

  override def nullSafeEval(toks: Any, n: Any): Any =
    Hash60.wordGramHashes(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) =>
      s"${ev.value} = graft.functions.Hash60.wordGramHashes($toks, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_word_gram_hash60"
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
    fold()
  }

  /** hash60 of `parts.slice(from, from + n)` joined by a single space —
    * md5-identical to `hash60(concat_ws(" ", ...))` with zero string
    * concatenation: the digest streams each part's bytes in place. Null
    * parts are skipped ENTIRELY (no joiner either side), exactly as
    * `concat_ws` skips null arguments — so [a, null, b] hashes "a b",
    * not "a  b".
    */
  def hashJoined(parts: Array[Array[Byte]], from: Int, n: Int): Long = {
    val m = md5.get()
    m.reset()
    var i = 0
    var emitted = false
    while (i < n) {
      val p = parts(from + i)
      if (p != null) {
        if (emitted) m.update(' '.toByte)
        m.update(p)
        emitted = true
      }
      i += 1
    }
    fold()
  }

  private def fold(): Long = {
    val d = out16.get()
    md5.get().digest(d, 0, 16)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** [[WordGramHash60]]'s body (named, like GramHash60.hashStream, to keep
    * the static forwarder janino-visible): per-position word-gram hashes;
    * empty array when the document has fewer than `n` tokens. A null token
    * element is skipped entirely — joiner included — matching the
    * `concat_ws(" ", ...)` spelling the expression is documented identical
    * to (tokens() never produces one, but the function is registered as a
    * general SQL function, so arbitrary token arrays must agree).
    */
  def wordGramHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array.emptyLongArray)
    val parts = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) {
      parts(i) =
        if (arr.isNullAt(i)) null
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](cnt - n + 1)
    var p = 0
    while (p < out.length) { out(p) = hashJoined(parts, p, n); p += 1 }
    new GenericArrayData(out)
  }
}
