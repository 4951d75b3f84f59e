package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Capped native gunzip: `graft_gunzip(payload, maxBytes)` → the
  * decompressed bytes, or NULL when the payload is not a well-formed gzip
  * stream OR inflates past `maxBytes` — the cap is the zip-bomb guard a
  * column-level decompressor over HOSTILE crawl bytes must have (a 42 KB
  * member can inflate to gigabytes; an uncapped scalar would OOM the
  * task, the exact failure mode the i17 `maxRecordBytes` contract
  * exists to prevent). NULL-on-failure keeps the scan alive; callers
  * that need the reason route the payload through the record-level
  * quarantine paths instead.
  *
  * The intake use: gzipped sitemaps (`sitemap.xml.gz` — explicitly part
  * of the sitemaps.org protocol) ship as gzip BYTES without a
  * Content-Encoding header, so the HTTP-layer entity decode never fires;
  * [[graft.sources.Warc.sitemapBodies]] inflates them through this.
  */
case class Gunzip(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_gunzip maxBytes must be a constant")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_gunzip expects (binary, int maxBytes), got $l / $r")
    }

  override def nullSafeEval(payload: Any, cap: Any): Any =
    Gunzip.gunzip(payload.asInstanceOf[Array[Byte]], cap.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = nullSafeCodeGen(ctx, ev, (p, cap) => {
      val tmp = ctx.freshName("gz")
      s"""
         |byte[] $tmp = graft.functions.Gunzip.gunzip($p, $cap);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
    out
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_gunzip"
}

object Gunzip {

  /** Default inflate cap: generous for any real sitemap (the protocol
    * caps an UNCOMPRESSED sitemap at 50 MB), tight enough that a bomb
    * costs one bounded buffer.
    */
  val DefaultMaxBytes: Int = 64 << 20

  /** null on malformed/truncated gzip or when output would exceed `cap`
    * (checked AS it inflates — the bomb never materializes past cap).
    */
  def gunzip(payload: Array[Byte], cap: Int): Array[Byte] = {
    if (cap <= 0) return null
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(payload))
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(payload.length * 4, 1024), cap))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size() + n > cap) return null
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case _: java.io.IOException => null }
  }
}
