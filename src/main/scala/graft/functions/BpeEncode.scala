package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  * spelling.
  *
  * The merge table must be foldable (a constant literal, like
  * [[BinBySplits]]' splits): the rank map is built ONCE per expression
  * instance and rides codegen as a referenced object, so the per-row cost
  * is the merge loop itself — no map rebuild, no UDF boundary. Cost per
  * token is O(L·merges_applied) with L = symbol count; real-world tokens
  * are short and applied merges ≤ L−1.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_bpe_encode merge table must be a constant (foldable) " +
              "array: the rank map is built once per expression instance")
        else {
          val v = right.eval()
          if (v == null)
            TypeCheckResult.TypeCheckFailure("graft_bpe_encode merge table must not be null")
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
            if (err != null) TypeCheckResult.TypeCheckFailure(s"graft_bpe_encode: $err")
            else TypeCheckResult.TypeCheckSuccess
          }
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects (string, array<string>), got $l / $r")
    }

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val a = right.eval().asInstanceOf[ArrayData]
    val m = new java.util.HashMap[String, Integer](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      m.put(a.getUTF8String(i).toString, Integer.valueOf(i + 1))
      i += 1
    }
    m
  }

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

object BpeEncode {

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
