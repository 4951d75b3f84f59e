package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared contract of the two native BPE encodes: `(token string,
  * CONSTANT rank-ordered merge table)` → subword array. The merge table
  * must be foldable (a constant literal, like [[BinBySplits]]' splits):
  * the rank map is built ONCE per expression instance and rides codegen
  * as a referenced object, so the per-row cost is the merge loop itself —
  * no map rebuild, no UDF boundary.
  */
trait BpeEncodeLike extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName merge table must be a constant (foldable) " +
              "array: the rank map is built once per expression instance")
        else {
          val v = right.eval()
          if (v == null)
            TypeCheckResult.TypeCheckFailure(s"$prettyName merge table must not be null")
          else {
            val a = v.asInstanceOf[ArrayData]
            var err: String = null
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i < a.numElements() && err == null) {
              if (a.isNullAt(i)) err = s"merge at rank ${i + 1} is null"
              else {
                val s = a.getUTF8String(i).toString
                val parts = s.split(" ", -1)
                if (parts.length != 2 || parts(0).isEmpty || parts(1).isEmpty)
                  err = s"merge '$s' must be two space-separated non-empty symbols"
                else if (!seen.add(s))
                  err = s"duplicate merge '$s' (ranks must be unambiguous)"
              }
              i += 1
            }
            if (err != null) TypeCheckResult.TypeCheckFailure(s"$prettyName: $err")
            else TypeCheckResult.TypeCheckSuccess
          }
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string>), got $l / $r")
    }

  @transient protected lazy val ranks: java.util.HashMap[String, Integer] = {
    val a = right.eval().asInstanceOf[ArrayData]
    val m = new java.util.HashMap[String, Integer](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      m.put(a.getUTF8String(i).toString, Integer.valueOf(i + 1))
      i += 1
    }
    m
  }
}

/** Native BPE subword encode: `graft_bpe_encode(token, merges)` → the
  * token's subword segmentation under a CONSTANT rank-ordered merge table
  * (each element `"a b"`, rank = 1-based position — the
  * [[graft.text.Bpe]] training output format, Sennrich et al. 2016,
  * public methodology).
  *
  * Algorithm: start from the token's code points; repeatedly merge the
  * LEFTMOST occurrence of the LOWEST-ranked adjacent symbol pair until no
  * ranked pair remains. One-merge-per-step with global min-rank selection
  * is provably equivalent to the classic replay (for each rank in order,
  * fuse all occurrences left-to-right): a ranked pair's constituent
  * symbols are always products of strictly lower ranks, so a later merge
  * can never create an instance of an earlier rank — property-pinned
  * against the training segmentation and the recursive-CTE oracle
  * spelling. Cost per token is O(L·merges_applied) with L = symbol count.
  */
case class BpeEncode(left: Expression, right: Expression) extends BpeEncodeLike {

  override def nullSafeEval(tok: Any, merges: Any): Any =
    BpeEncode.encode(tok.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (tok, _) =>
      s"${ev.value} = graft.functions.BpeEncode.encode($tok, $ranksRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bpe_encode"
}

/** BYTE-LEVEL BPE encode (r15): `graft_bpe_byte_encode(token, merges)`.
  * The base alphabet is the 256 byte values of the token's UTF-8 encoding
  * — rendered printable through the public GPT-2 byte↔unicode bijection
  * so symbols stay ordinary strings in the same `"a b"` merge-table
  * format — plus an explicit end-of-word symbol appended to every token.
  * Any unicode input is encodable (no OOV by construction) and
  * `decode(encode(x)) == x` holds EXACTLY for arbitrary input under ANY
  * merge table (property-pinned): the end-of-word marker can only ever be
  * a symbol suffix (it starts last and merges keep relative order), so
  * stripping it and inverting the byte bijection recovers the exact
  * UTF-8 bytes. This is the production byte-level story the code-point
  * encode lacks — there, an unseen code point or a combining sequence has
  * no decomposition below the character, and round-tripping is only
  * guaranteed for NFC-stable text.
  */
case class BpeByteEncode(left: Expression, right: Expression) extends BpeEncodeLike {

  override def nullSafeEval(tok: Any, merges: Any): Any =
    BpeEncode.encodeBytes(tok.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (tok, _) =>
      s"${ev.value} = graft.functions.BpeEncode.encodeBytes($tok, $ranksRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bpe_byte_encode"
}

object BpeEncode {

  /** End-of-word symbol appended by the byte-level mode (Sennrich's
    * `</w>` convention). Multi-char, so it can never collide with the
    * single-char byte symbols; always sequence-final, so it can only ever
    * appear as a SUFFIX of a merged symbol.
    */
  val EndOfWord = "</w>"

  /** GPT-2's public byte→printable-unicode bijection: bytes that are
    * printable (no space/control — the merge-table format is
    * space-separated) map to themselves; the rest map to 256, 257, … in
    * byte order. Every byte symbol is exactly ONE char.
    */
  val ByteToChar: Array[Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[ByteToChar]]: char → byte value, -1 if not a byte symbol. */
  val CharToByte: Array[Int] = {
    val out = Array.fill(512)(-1)
    var b = 0
    while (b < 256) { out(ByteToChar(b)) = b; b += 1 }
    out
  }

  /** The encode core (janino-visible static forwarder, the Hash60
    * discipline): code-point symbols → min-rank/leftmost merge loop.
    */
  def encode(tok: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = tok.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val syms = new java.util.ArrayList[String]()
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      syms.add(s.substring(i, i + n))
      i += n
    }
    mergeLoop(syms, ranks)
  }

  /** Byte-level encode core: UTF-8 bytes → printable byte symbols +
    * [[EndOfWord]], then the same min-rank/leftmost merge loop.
    */
  def encodeBytes(tok: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val bytes = tok.getBytes
    val syms = new java.util.ArrayList[String](bytes.length + 1)
    var i = 0
    while (i < bytes.length) {
      syms.add(String.valueOf(ByteToChar(bytes(i) & 0xff)))
      i += 1
    }
    syms.add(EndOfWord)
    mergeLoop(syms, ranks)
  }

  private def mergeLoop(syms: java.util.ArrayList[String],
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    var done = syms.size <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = j
        }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
        if (syms.size <= 1) done = true
      }
    }
    val out = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(out)
  }
}
