package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Long-array bitset from an array of global ranks: bit `r % 64` of word
  * `r / 64` set for every rank `r` in `[0, words·64)`; out-of-range and
  * null ranks are ignored (the caller's rank space is the contract).
  *
  * This is the per-DOCUMENT build step of the dense containment path
  * ([[graft.text.Containment]]): the prior HOF spelling ran an
  * interpreted `filter`+`aggregate` lambda chain PER WORD — words × |ranks|
  * interpreted evals and `words` filtered-array allocations per document
  * (~13M lambda evals at 5k docs × 15 words) — where this is one generated
  * pass over the rank array into a preallocated long[]. Same ~10× gap
  * [[DotProduct]] and [[BitAndCount]] measured on their paths; the HOF
  * spelling is kept as the parity-pinned specification in TextSpec.
  */
case class BitsetFromRanks(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_bitset expects (array<int|bigint>, int), got ${left.dataType} / ${right.dataType}")
    }

  private def rankAt(xs: ArrayData, i: Int): Long = left.dataType match {
    case ArrayType(IntegerType, _) => xs.getInt(i).toLong
    case _ => xs.getLong(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val words = b.asInstanceOf[Int]
    val out = new Array[Long](math.max(0, words))
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val r = rankAt(xs, i)
        if (r >= 0 && r < words.toLong * 64)
          out((r >> 6).toInt) |= 1L << (r & 63)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getter = left.dataType match {
        case ArrayType(IntegerType, _) => s"(long) $a.getInt"
        case _ => s"$a.getLong"
      }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      s"""
         |int $w = java.lang.Math.max(0, $b);
         |long[] $out = new long[$w];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $r = $getter($i);
         |    if ($r >= 0 && $r < ((long) $w) * 64L) {
         |      $out[(int) ($r >> 6)] |= 1L << ($r & 63);
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bitset"
}
