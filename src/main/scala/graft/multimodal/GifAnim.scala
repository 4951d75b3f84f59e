package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Binary.{MediaPayload, PngPixels}

/** REAL multi-frame decode for q48 — the last multimodal stub replaced:
  * animated GIF is a genuine multi-frame container the repo's ImageIO
  * seam ([[Binary.decodeImagePixels]]'s GIF route) can already open, so
  * frame sampling becomes: validate the container NAMED
  * ([[Binary.parseGif]]), decode every `stride`-th REAL frame through
  * `javax.imageio`'s frame-indexed reader, and fingerprint each sampled
  * frame with q101's [[ImageHash.dhash60]] — per-frame features that
  * ride the ENTIRE SimHash near-dup machinery unchanged (near-duplicate
  * ANIMATIONS band-join exactly like near-duplicate stills).
  *
  * Synthesis is the q30/q101/q111 canvas discipline: each doc renders as
  * a REAL animated GIF (hand-rolled encoder — spec-valid GIF89a with a
  * 256-gray global palette and LZW-UNCOMPRESSED pixel codes: a CLEAR
  * every 254 literals keeps all codes 9-bit, the classic spec-legal
  * no-compression spelling any decoder reads exactly), frame k's raster
  * = text bytes [k·W·H, (k+1)·W·H) zero-padded — so the DuckDB oracle
  * recomputes every sampled frame's dHash arithmetically from
  * `ascii(substr(text, …))` without parsing a byte, while the engine
  * runs the actual container walk + LZW decode + palette raster.
  *
  * Scale: decode + hash is a per-partition scan (no shuffle); cost
  * scales with the SAMPLING RATE (frames decoded per payload), not the
  * media size — the property the q48 stub was standing in for.
  */
object GifAnim {

  /** Synthesis canvas: 32 wide (the q101 convention) × 4 rows per frame
    * → 128 bytes per frame.
    */
  val FrameW = 32
  val FrameH = 4

  // ---------------------------------------------------------------------
  // Animated-GIF encoder (pure JVM, spec-valid GIF89a).
  // ---------------------------------------------------------------------

  /** Encode full-frame gray rasters (one byte per pixel, row-major,
    * each exactly w·h bytes) as an animated GIF89a with a 256-gray
    * global color table — palette index v decodes to (v,v,v), so the
    * rendered luma IS the input byte (Rec.601 of r=g=b is exact).
    */
  def encodeGifAnimation(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, s"bad canvas ${w}x$h")
    require(frames.nonEmpty, "at least one frame")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == w * h, s"frame $i holds ${f.length} bytes, want ${w * h}")
    }
    val out = new java.io.ByteArrayOutputStream(64 + frames.length * (w * h * 9 / 8 + 32))
    def b(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { b(v); b(v >>> 8) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le16(w); le16(h)
    b(0xf7) // GCT present, 8-bit color resolution, 256 entries
    b(0); b(0)
    var v = 0
    while (v < 256) { b(v); b(v); b(v); v += 1 } // gray ramp palette
    frames.foreach { f =>
      // Graphic Control Extension: no disposal tricks, 0.1 s delay
      b(0x21); b(0xf9); b(4); b(0); le16(10); b(0); b(0)
      // full-canvas image descriptor, no local palette
      b(0x2c); le16(0); le16(0); le16(w); le16(h); b(0)
      b(8) // LZW min code size
      val lzw = lzwUncompressed(f)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        b(n); out.write(lzw, off, n); off += n
      }
      b(0) // block terminator
    }
    b(0x3b)
    out.toByteArray
  }

  /** GIF-LZW stream that never compresses: CLEAR, then each pixel as its
    * own literal code, re-CLEARing every 254 literals so the decoder's
    * table stays under 512 entries and every code reads at 9 bits.
    * LSB-first bit packing per the GIF spec.
    */
  private def lzwUncompressed(pixels: Array[Byte]): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val out = new java.io.ByteArrayOutputStream(pixels.length * 9 / 8 + 8)
    var cur = 0
    var nbits = 0
    def code(c: Int): Unit = {
      cur |= c << nbits; nbits += 9
      while (nbits >= 8) { out.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    code(Clear)
    var i = 0
    var sinceClear = 0
    while (i < pixels.length) {
      if (sinceClear == 254) { code(Clear); sinceClear = 0 }
      code(pixels(i) & 0xff)
      sinceClear += 1
      i += 1
    }
    code(Eoi)
    if (nbits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // Multi-frame decode through the ImageIO seam.
  // ---------------------------------------------------------------------

  /** Decode EVERY frame of a GIF payload ([[decodeSampledFrames]] at
    * stride 1, frame ids dropped).
    */
  def decodeGifFrames(p: Array[Byte]): Seq[PngPixels] =
    decodeSampledFrames(p, 1)._2.map(_._2)

  /** Decode frames 0, stride, 2·stride, … of a GIF payload to the
    * [[PngPixels]] raster shape (palette renders as RGB — the
    * [[Binary.decodeImagePixels]] convention), returning
    * (container frame count, sampled (frame_id, raster) pairs).
    * ONLY the sampled frames rasterize — `reader.read(k)` block-skips
    * the rest, so decode cost scales with the SAMPLING RATE, which is
    * the q48 contract. Header-validates NAMED first
    * ([[Binary.parseGif]]), so truncation keeps its exact error instead
    * of an opaque codec one.
    */
  def decodeSampledFrames(p: Array[Byte],
      stride: Int): (Int, Seq[(Int, PngPixels)]) = {
    require(stride > 0, s"stride must be positive, got $stride")
    Binary.parseGif(p)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("gif: no registered ImageIO reader")
      val reader = readers.next()
      reader.setInput(iis, false, true)
      try {
        val n =
          try reader.getNumImages(true)
          catch { case e: Exception =>
            throw new IllegalArgumentException(s"gif: frame walk failed: ${e.getMessage}") }
        if (n < 1) throw new IllegalArgumentException("gif: no frames")
        val sampled = (0 until n by stride).map { k =>
          val img =
            try reader.read(k)
            catch { case e: Exception =>
              throw new IllegalArgumentException(s"gif: frame $k decode failed: ${e.getMessage}") }
          (k, rasterOf(img))
        }
        (n, sampled)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** BufferedImage → [[PngPixels]], the [[Binary]] ImageIO conventions:
    * palette classifies as RGB content, alpha appended when present.
    */
  private def rasterOf(img: java.awt.image.BufferedImage): PngPixels = {
    val w = img.getWidth
    val h = img.getHeight
    val cm = img.getColorModel
    val gray = cm.getColorSpace.getType == java.awt.color.ColorSpace.TYPE_GRAY &&
      !cm.isInstanceOf[java.awt.image.IndexColorModel]
    val hasAlpha = cm.hasAlpha
    val channels = (if (gray) 1 else 3) + (if (hasAlpha) 1 else 0)
    val out = new Array[Byte](w * h * channels)
    val row = new Array[Int](w)
    var y = 0
    var o = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val v = row(x)
        if (gray) { out(o) = (v & 0xff).toByte; o += 1 }
        else {
          out(o) = ((v >>> 16) & 0xff).toByte
          out(o + 1) = ((v >>> 8) & 0xff).toByte
          out(o + 2) = (v & 0xff).toByte
          o += 3
        }
        if (hasAlpha) { out(o) = ((v >>> 24) & 0xff).toByte; o += 1 }
        x += 1
      }
      y += 1
    }
    PngPixels(w, h, channels, out)
  }

  // ---------------------------------------------------------------------
  // Synthesis + the sampled per-frame fingerprint scan.
  // ---------------------------------------------------------------------

  /** One animated GIF per doc: frame k's raster = text bytes
    * [k·128, (k+1)·128) zero-padded on the 32×4 canvas, ⌈len/128⌉ frames
    * (min 1) — closed-form in the text, the oracle's contract.
    */
  def toGifAnimations(spark: SparkSession, docs: DataFrame): Dataset[MediaPayload] = {
    import spark.implicits._
    val (fw, fh) = (FrameW, FrameH)
    // widen: GIF synthesis + the downstream per-frame decode are per-doc-
    // heavy and run before any exchange — a one-row-group corpus scan
    // would serialize them on one core (no-op at scale).
    graft.sources.Sources.widen(
        docs.select(col("doc_id").cast("long"), col("text")), col("doc_id"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val perFrame = fw * fh
        val n = math.max(1, (bytes.length + perFrame - 1) / perFrame)
        val frames = (0 until n).map { k =>
          val f = new Array[Byte](perFrame)
          val from = k * perFrame
          val len = math.min(perFrame, math.max(0, bytes.length - from))
          if (len > 0) System.arraycopy(bytes, from, f, 0, len)
          f
        }
        MediaPayload(id, encodeGifAnimation(fw, fh, frames), "image/gif")
      })
  }

  /** Sampled per-frame dHash scan: decode frames 0, stride, 2·stride, …
    * of each payload, fingerprint each with [[ImageHash.dhash60]] —
    * (doc_id, frame_id, n_frames, frame_dhash). One per-partition pass;
    * rows scale with the sampling rate.
    */
  def frameDhashes(payloads: Dataset[MediaPayload], frameStride: Int): DataFrame = {
    require(frameStride > 0, s"frameStride must be positive, got $frameStride")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions(_.flatMap { mp =>
        val (n, sampled) = decodeSampledFrames(mp.payload, frameStride)
        sampled.map { case (k, px) =>
          (mp.doc_id, k.toLong, n.toLong, ImageHash.dhash60(px))
        }
      })
      .toDF("doc_id", "frame_id", "n_frames", "frame_dhash")
  }
}
