package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CharsetDecoder, CodingErrorAction, IllegalCharsetNameException, StandardCharsets, UnsupportedCharsetException}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware text decode for crawl intake (i17 → q93). Real crawls are
  * ~10% non-UTF-8 (windows-1251, Shift_JIS, GBK, latin-1); decoding those
  * payloads as UTF-8 silently turns entire non-English strata into
  * replacement-char mojibake that poisons every downstream gram (langid,
  * quality, dedup). The charset is usually IN HAND, in the standard
  * priority order HTML parsers use (public convention, WHATWG encoding
  * sniffing): the HTTP `Content-Type` header's `charset=` parameter wins,
  * then a `<meta charset=…>` / `<meta http-equiv="Content-Type"
  * content="…; charset=…">` tag in the first [[CharsetText.SniffBytes]]
  * bytes, then UTF-8. The chosen name is emitted as its own column so
  * mis-sniffs stay diagnosable.
  *
  * Reference lineage: the format-aware bronze readers
  * (2_bronze_ingestion_adf/datasets/generic_adls_flat_file_ds.json) —
  * formats are DECLARED per source, never assumed.
  *
  * Two codegen'd expressions: `graft_charset_sniff(content_type, payload)`
  * → the canonical charset name to use, and
  * `graft_charset_decode(payload, charset)` → the decoded string, with
  * malformed/unmappable input REPLACED (a bad byte degrades one character,
  * never fails the scan — the prior UTF-8-only `decode()` contract, kept).
  */
case class CharsetSniff(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_charset_sniff expects (string content_type, binary payload), got $l / $r")
  }

  override def nullSafeEval(ct: Any, payload: Any): Any =
    CharsetText.sniff(ct.asInstanceOf[UTF8String], payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ct, p) =>
      s"${ev.value} = graft.functions.CharsetText.sniff($ct, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_charset_sniff"
}

/** `graft_charset_decode(payload BINARY, charset STRING) → STRING`: decode
  * under any JVM-supported charset with REPLACE error action; an unknown
  * charset name itself falls back to UTF-8 (never a failed scan — pair
  * with [[CharsetSniff]], which only emits supported names).
  */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_charset_decode expects (binary payload, string charset), got $l / $r")
  }

  override def nullSafeEval(payload: Any, cs: Any): Any =
    CharsetText.decode(payload.asInstanceOf[Array[Byte]], cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, cs) =>
      s"${ev.value} = graft.functions.CharsetText.decode($p, $cs);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_charset_decode"
}

object CharsetText {

  /** Meta-tag sniff window: the WHATWG prescan convention reads the first
    * 1024 bytes — declarations virtually always sit in the head.
    */
  val SniffBytes: Int = 1024

  // `charset = "x"` inside a Content-Type header value (RFC 9110 §8.3:
  // token or quoted-string parameter)
  private val HeaderCharset = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*\"?\\s*([A-Za-z0-9][A-Za-z0-9._:+-]*)")
  // `<meta charset=x>` and `<meta http-equiv=… content="…; charset=x">` —
  // both spell `charset=` inside one <meta …> tag
  private val MetaCharset = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]{0,256}?charset\\s*=\\s*['\"]?\\s*([A-Za-z0-9][A-Za-z0-9._:+-]*)")

  private val Utf8Name = UTF8String.fromString("utf-8")

  /** The charset to decode `payload` under, canonical-lowercase:
    * Content-Type `charset=` parameter → meta-tag prescan over the first
    * [[SniffBytes]] bytes (ISO-8859-1 view — byte-transparent for ASCII
    * markup) → `utf-8`. Unsupported/malformed declared names fall through
    * to the next source, so a NON-NULL result is always a decodable
    * charset. NULL inputs follow standard SQL null semantics at the
    * expression layer (BinaryExpression short-circuits before this method
    * runs): a NULL content_type or payload yields a NULL sniff —
    * `coalesce(content_type, '')` upstream if a fallback is wanted
    * ([[graft.sources.Warc.htmlDocuments]] filters nulls out first).
    */
  def sniff(contentType: UTF8String, payload: Array[Byte]): UTF8String = {
    if (contentType != null) {
      val m = HeaderCharset.matcher(contentType.toString)
      if (m.find()) {
        val c = canonical(m.group(1))
        if (c != null) return UTF8String.fromString(c)
      }
    }
    if (payload != null && payload.length > 0) {
      val n = math.min(SniffBytes, payload.length)
      val prefix = new String(payload, 0, n, StandardCharsets.ISO_8859_1)
      val m = MetaCharset.matcher(prefix)
      if (m.find()) {
        val c = canonical(m.group(1))
        if (c != null) return UTF8String.fromString(c)
      }
    }
    Utf8Name
  }

  private def canonical(name: String): String =
    try {
      if (Charset.isSupported(name))
        Charset.forName(name).name().toLowerCase(java.util.Locale.ROOT)
      else null
    } catch {
      case _: IllegalCharsetNameException => null
      case _: UnsupportedCharsetException => null
    }

  // Decoder instances are stateful and not thread-safe: one small
  // name-keyed cache per executor thread (a scan sees a handful of
  // charsets; building a CharsetDecoder per row would dominate).
  private val decoders: ThreadLocal[java.util.HashMap[String, CharsetDecoder]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, CharsetDecoder]())

  // Keep the per-thread cache BOUNDED under data-driven garbage names
  // (register-for-SQL contract) without paying canonical() — which
  // constructs/catches an exception on illegal names — per row: the cache
  // keys on the RAW name (one HashMap.get per hit, the hot path), and a
  // rare overflow past this bound clears it wholesale (decoders are cheap
  // to rebuild; a real scan sees a handful of distinct names).
  private val DecoderCacheBound = 256

  /** Decode with malformed/unmappable REPLACED; an unknown charset name
    * decodes as UTF-8 (the sniffer never emits one, but the function is
    * registered for general SQL use and must not fail a scan — a NULL
    * charset short-circuits to NULL at the expression layer like any SQL
    * function).
    */
  def decode(payload: Array[Byte], charsetName: UTF8String): UTF8String = {
    val raw = if (charsetName == null) "utf-8" else charsetName.toString
    val cache = decoders.get()
    var dec = cache.get(raw)
    if (dec == null) {
      if (cache.size >= DecoderCacheBound) cache.clear()
      val name = { val c = canonical(raw); if (c != null) c else "utf-8" }
      dec = Charset.forName(name).newDecoder()
        .onMalformedInput(CodingErrorAction.REPLACE)
        .onUnmappableCharacter(CodingErrorAction.REPLACE)
      cache.put(raw, dec)
    }
    val out =
      try dec.decode(ByteBuffer.wrap(payload)).toString
      catch { case _: CharacterCodingException =>
        // unreachable under REPLACE; belt-and-braces for exotic providers
        new String(payload, StandardCharsets.UTF_8)
      }
    UTF8String.fromString(out)
  }
}
