package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM subword encode: `graft_unigram_encode(token, vocab)`
  * → the Viterbi-best segmentation of `token` under a CONSTANT vocabulary
  * of scored pieces (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram model, public methodology; [[BpeEncode]]'s
  * sibling from the OTHER public tokenizer family). Each vocab element is
  * `piece<TAB>logProb`; the piece→score map is built once per expression
  * instance and rides codegen as a referenced object (the BpeEncode
  * discipline) — per-row cost is the Viterbi DP itself, O(len ·
  * maxPieceLen).
  *
  * Segmentation maximizes Σ logProb; a character absent from every vocab
  * piece falls back to a single-codepoint piece at [[UnigramEncode.UnkScore]]
  * (total function — concatenating the output ALWAYS reproduces the
  * token exactly, property-pinned). Ties are deterministic: equal score →
  * fewer pieces → longer final piece.
  */
case class UnigramEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName vocab must be a constant (foldable) array: the " +
              "score map is built once per expression instance")
        else {
          val v = right.eval()
          if (v == null)
            TypeCheckResult.TypeCheckFailure(s"$prettyName vocab must not be null")
          else {
            val a = v.asInstanceOf[ArrayData]
            var err: String = null
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i < a.numElements() && err == null) {
              if (a.isNullAt(i)) err = s"vocab entry ${i + 1} is null"
              else {
                val s = a.getUTF8String(i).toString
                val t = s.indexOf('\t')
                if (t <= 0 || t == s.length - 1)
                  err = s"vocab entry '$s' must be piece<TAB>logProb"
                else if (!seen.add(s.substring(0, t)))
                  err = s"duplicate piece '${s.substring(0, t)}'"
                else try { s.substring(t + 1).toDouble; () } catch {
                  case _: NumberFormatException =>
                    err = s"vocab entry '$s' has a non-numeric logProb"
                }
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

  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Double] = {
    val a = right.eval().asInstanceOf[ArrayData]
    val m = new java.util.HashMap[String, java.lang.Double](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      val s = a.getUTF8String(i).toString
      val t = s.indexOf('\t')
      m.put(s.substring(0, t), java.lang.Double.valueOf(s.substring(t + 1).toDouble))
      i += 1
    }
    m
  }

  @transient private lazy val maxLen: Int = {
    var n = 1
    vocab.keySet.forEach(k => n = math.max(n, k.length))
    n
  }

  override def nullSafeEval(tok: Any, v: Any): Any =
    UnigramEncode.encode(tok.asInstanceOf[UTF8String], vocab, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (tok, _) =>
      s"${ev.value} = graft.functions.UnigramEncode.encode($tok, $vocabRef, $maxLen);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_unigram_encode"
}

object UnigramEncode {

  /** Log-score of a single-codepoint UNKNOWN fallback piece — far below
    * any trained piece (trained log-probs are > -40 at any real vocab
    * size), so Viterbi uses known pieces whenever one covers the span.
    */
  val UnkScore: Double = -100.0

  /** The encode core (janino-visible static forwarder): Viterbi DP over
    * char positions, pieces up to `maxLen` chars, single-CODEPOINT
    * unknown fallback (a surrogate pair is never split, so concatenation
    * reproduces arbitrary unicode exactly). Deterministic ties: equal
    * score → fewer pieces → longer final piece.
    */
  def encode(tok: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): ArrayData =
    new GenericArrayData(
      viterbi(tok.toString, vocab, maxLen).map(UTF8String.fromString(_): Any))

  /** Driver-visible Viterbi (training's E-step runs THIS method, so the
    * deployed encode replays training segmentation by construction).
    */
  def viterbi(s: String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    val n = s.length
    if (n == 0) return Array.empty[String]
    val score = new Array[Double](n + 1)
    val pieces = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      // vocab pieces ending at i
      var len = 1
      val maxHere = math.min(maxLen, i)
      while (len <= maxHere) {
        val j = i - len
        if (score(j) > Double.NegativeInfinity) {
          val lp = vocab.get(s.substring(j, i))
          if (lp != null) {
            val cand = score(j) + lp.doubleValue()
            val candPieces = pieces(j) + 1
            if (cand > score(i) ||
              (cand == score(i) && (candPieces < pieces(i) ||
                (candPieces == pieces(i) && j < back(i))))) {
              score(i) = cand; pieces(i) = candPieces; back(i) = j
            }
          }
        }
        len += 1
      }
      // single-codepoint unknown fallback (guarantees totality)
      val cpLen = if (i >= 2 &&
        Character.isSurrogatePair(s.charAt(i - 2), s.charAt(i - 1))) 2 else 1
      val j = i - cpLen
      if (score(j) > Double.NegativeInfinity) {
        val cand = score(j) + UnkScore
        val candPieces = pieces(j) + 1
        if (cand > score(i) ||
          (cand == score(i) && (candPieces < pieces(i) ||
            (candPieces == pieces(i) && j < back(i))))) {
          score(i) = cand; pieces(i) = candPieces; back(i) = j
        }
      }
      i += 1
    }
    val out = new Array[String](pieces(n))
    var pos = n
    var k = pieces(n) - 1
    while (pos > 0) {
      out(k) = s.substring(back(pos), pos)
      pos = back(pos)
      k -= 1
    }
    out
  }
}
