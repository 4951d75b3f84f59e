package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization: `graft_nfc(text)` → the canonical
  * composed form (Unicode Standard Annex #15, public). Real crawls mix
  * composed and decomposed spellings of the same text (`é` as U+00E9 vs
  * `e` + U+0301 — macOS filenames, some CMSes, copy-paste chains), and
  * every byte-keyed operator downstream treats them as DIFFERENT: exact
  * dedup misses the duplicate, grams split, fingerprints diverge.
  * Normalizing at intake is the canonical-representation-before-logic
  * move (the reference's silver cast/trim block) at the CODEPOINT level.
  *
  * One codegen'd call into the JDK's `java.text.Normalizer` (ICU-derived,
  * bit-stable per Unicode version); the ASCII fast path skips the
  * normalizer entirely — `Normalizer.isNormalized` is O(n) with no
  * allocation, and web corpora are mostly ASCII, so the common row costs
  * one scan. DuckDB's `nfc_normalize` mirrors it for the oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {

  /** The normalize core (janino-visible static forwarder). Pure-ASCII
    * input (the overwhelmingly common case on web corpora) is detected by
    * one byte scan over the UTF8String — ASCII is always NFC — and
    * returns the INPUT with zero allocation; only non-ASCII rows pay the
    * toString + isNormalized/normalize round-trip.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
