package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.Binary.{MediaPayload, PngPixels}
import graft.text.SimHash

/** Perceptual-hash near-duplicate detection over DECODED image pixels —
  * the image-side sibling of the text dedup family (crawled corpora carry
  * the same page art re-encoded thousands of times; byte-exact dedup
  * misses every re-save, a perceptual hash catches them).
  *
  * The hash is a 60-bit difference hash (dHash): nearest-sample the luma
  * raster to a 6×11 grid, set bit (r·10 + c) when grid(r,c) > grid(r,c+1)
  * — brightness GRADIENTS survive re-encode/rescale while absolute pixel
  * values don't. 60 bits on purpose: the fingerprint then rides the
  * ENTIRE [[SimHash]] candidate machinery unchanged (6 × 10-bit bands,
  * [[SimHash.BandBucketCap]] with the over-cap star channel, exact
  * Hamming verify) — one banding implementation, two hash families.
  *
  * Scale: decode+hash is a per-partition scan (no shuffle); candidates
  * are SimHash's capped equi-join on (band, value). No cross join, no
  * all-pairs — the q21/q22 LSH shape applied to pixels.
  *
  * Reference analog: the silver layer's dedup step
  * (4_silver/silver_transactions.py:105-113) — same drop-the-re-observed
  * semantics, lifted to a modality the reference never ingests.
  */
object ImageHash {

  /** dHash grid: 6 rows × 11 cols → 6 × 10 = 60 comparison bits. */
  val GridRows = 6
  val GridCols = 11

  /** 60-bit difference hash of a decoded raster. Nearest-sample
    * downsampling (grid cell (r,c) reads the pixel at row r·h/6, col
    * c·w/11) rather than block averaging — integer-exact, well-defined
    * for ANY h,w ≥ 1 (degenerate heights just repeat sample rows), and
    * closed-form in the source bytes, which is what lets the q101 oracle
    * recompute it arithmetically. Luma is [[Binary.lumaAt]] — the one
    * Rec.601 definition shared with q30's stats.
    */
  def dhash60(px: PngPixels): Long = {
    val g = new Array[Int](GridCols)
    var hash = 0L
    var r = 0
    while (r < GridRows) {
      val row = r * px.height / GridRows
      var c = 0
      while (c < GridCols) {
        val col = c * px.width / GridCols
        g(c) = Binary.lumaAt(px, (row * px.width + col) * px.channels)
        c += 1
      }
      c = 0
      while (c < GridCols - 1) {
        if (g(c) > g(c + 1)) hash |= 1L << (r * 10 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** (doc_id, dhash) through the REAL pixel path for EVERY decodable
    * format ([[Binary.decodeImagePixels]]: PNG stays on the pure-JVM
    * inflate+defilter decoder, JPEG/GIF header-validate named then
    * rasterize through the ImageIO seam) — a re-save of the same art as
    * JPEG hashes within a few bits of the PNG (gradient structure
    * survives lossy re-encode; spec-pinned). One per-partition scan —
    * the decode cost amortizes exactly like [[Binary.decodeImageStats]].
    */
  def dhashes(payloads: Dataset[MediaPayload]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions(_.map(mp =>
        (mp.doc_id, dhash60(Binary.decodeImagePixels(mp.payload)))))
      .toDF("doc_id", "dhash")
  }

  /** Near-duplicate image pairs within `maxHamming`: delegates banding,
    * the bucket cap, and Hamming verification to [[SimHash.nearPairs]] —
    * a 60-bit fingerprint is a 60-bit fingerprint. Output
    * (id_a, id_b, hamming), id_a < id_b.
    */
  def nearPairs(hashes: DataFrame, maxHamming: Int,
      maxBucket: Option[Int] = Some(SimHash.BandBucketCap)): DataFrame =
    SimHash.nearPairs(hashes.withColumnRenamed("dhash", "simhash"),
      "doc_id", maxHamming, maxBucket)

  /** Per-payload decode+hash with MEMBER-LEVEL quarantine (the i17 WARC
    * discipline): a corrupt payload yields (doc_id, null, error) instead
    * of failing the scan — the streaming sink must survive one bad image
    * in a million. Only the decoder's NAMED rejections are caught; any
    * other throw is a bug and stays fatal.
    */
  def dhashesWithErrors(payloads: Dataset[MediaPayload]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions(_.map { mp =>
        try ((mp.doc_id, Option(dhash60(Binary.decodeImagePixels(mp.payload))),
          Option.empty[String]))
        catch {
          case e: IllegalArgumentException =>
            (mp.doc_id, Option.empty[Long], Option(e.getMessage))
        }
      })
      .toDF("doc_id", "dhash", "decode_error")
  }

  /** (doc_id, dhash, band, band_val) rows — the 6 × 10-bit banding of
    * [[SimHash]], public here for asymmetric (new-batch vs accumulated-
    * index) joins like the s24 streaming sink.
    */
  def bandRows(hashes: DataFrame): DataFrame =
    SimHash.bandRowsOf(hashes, "doc_id", "dhash")

  /** The capped family's star side channel ([[SimHash.overCapPairs]]):
    * >cap band-bucket cliques stay visible through their min-id
    * representative.
    */
  def overCapPairs(hashes: DataFrame, maxHamming: Int,
      cap: Int = SimHash.BandBucketCap): DataFrame =
    SimHash.overCapPairs(hashes.withColumnRenamed("dhash", "simhash"),
      "doc_id", maxHamming, cap)

  /** Survivorship verdicts over the image near-dup graph — the q39/q63
    * discipline applied to pixels: connected components of
    * [[nearPairs]] ∪ [[overCapPairs]] edges (the star channel keeps
    * >cap cliques collapsible), min-id survivor per component. Every
    * hashed doc gets a row: (doc_id, keep, dup_of) — singletons keep
    * themselves with a null `dup_of`.
    */
  def keepSet(hashes: DataFrame, maxHamming: Int,
      maxBucket: Option[Int] = Some(SimHash.BandBucketCap)): DataFrame =
    SimHash.keepSetOf(hashes, "doc_id", "dhash", maxHamming, maxBucket)
}
