package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Binary.MediaPayload
import graft.text.SimHash

/** Audio sample decode + perceptual dedup — the audio sibling of q101's
  * image path (q30 stopped at the WAV header; a training-data pipeline
  * needs the SAMPLES: per-clip stats for quality gates and a perceptual
  * fingerprint for exact and near-dup audio, because crawled corpora
  * carry the same clip re-encoded at different volumes/rates).
  *
  * The fingerprint is a 60-bit ENERGY-ENVELOPE difference hash: the clip
  * splits into [[FrameCount]] = 61 nearest-sample frames, frame energy
  * e(f) = Σ s², and bit f (0..59) is set when e(f) > e(f+1) — the dHash
  * idea in time. Energy RATIOS are what's compared, so uniform volume
  * scaling leaves the hash bit-identical (spec-pinned exactly for the
  * ×1/2 case: samples even → energies divide by exactly 4), and re-
  * encoding survives the way image gradients survive JPEG. 60 bits on
  * purpose: the fingerprint rides the ENTIRE [[SimHash]] candidate
  * machinery unchanged (6 × 10-bit bands, [[SimHash.BandBucketCap]],
  * over-cap star channel, exact Hamming verify) — one banding
  * implementation, three hash families (text, pixels, samples).
  *
  * Scale: decode + stats + hash is a per-partition scan (no shuffle);
  * candidates are SimHash's capped equi-join. The q21/q22/q101 LSH shape
  * applied to PCM.
  *
  * Reference analog: the silver dedup step
  * (4_silver/silver_transactions.py:105-113), lifted to a modality the
  * reference never ingests.
  */
object Audio {

  /** Synthesis/intake sample rate (Hz) for [[toWavPayloads]]. */
  val SampleRate = 8000

  /** Envelope frames: 61 frames → 60 adjacent-energy comparison bits. */
  val FrameCount = 61

  /** One decoded clip: PCM16 folded to MONO (multi-channel frames average
    * with truncating integer division — deterministic, and the synth path
    * is mono anyway), plus the declared rate.
    */
  final case class WavClip(sampleRate: Int, channels: Int, samples: Array[Int])

  /** Typed per-clip row: stats + the 60-bit envelope fingerprint. */
  final case class ClipRow(doc_id: Long, sample_rate: Int, n_samples: Int,
      peak: Int, sum_sq: Long, n_zero_crossings: Int, fp: Long)

  // ---------------------------------------------------------------------
  // WAV encode/decode (RIFF PCM16, pure JVM — RFC-less but fully public:
  // the canonical WAVE format spec). parseWav (Binary) reads header
  // metadata; this decodes the samples themselves.
  // ---------------------------------------------------------------------

  /** Spec-valid PCM16 LE mono WAV: RIFF + fmt (16-byte PCM block) + data.
    * Samples clamp to int16.
    */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    def tag(off: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, out, off, 4)
    }
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, 1) // mono
    put32(24, sampleRate)
    put32(28, sampleRate * 2) // byte rate
    put16(32, 2) // block align
    put16(34, 16) // bits
    tag(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      put16(44 + i * 2, s)
      i += 1
    }
    out
  }

  /** Decode a PCM16 RIFF/WAVE payload to mono samples. Walks the chunk
    * list ([[Binary.parseWav]]'s framing), takes the `fmt ` and `data`
    * chunks, rejects non-PCM / non-16-bit clips NAMED. Multi-channel
    * frames fold to mono by truncating-average.
    */
  def decodeWavSamples(p: Array[Byte]): WavClip = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"wav: $msg")
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def le32(off: Int): Long = (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E')
      fail("missing RIFF/WAVE magic")
    var i = 12
    var channels = -1
    var rate = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (i + 8 <= p.length && (channels < 0 || dataOff < 0)) {
      val id = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(i + 4)
      // a length past the remaining bytes is truncation OR a hostile
      // header (the i17 Content-Length lesson) — fail NAMED before the
      // chunk step can overflow Int and walk a negative offset
      if (len > p.length - i - 8) fail(s"chunk $id truncated or over-long: $len")
      if (id == "fmt ") {
        // bound by the chunk's OWN declared length, not the file end —
        // a hostile fmt chunk declaring len < 16 must not silently read
        // channels/rate/bits from the next chunk's bytes
        if (len < 16) fail("fmt chunk truncated")
        val audioFormat = le16(i + 8)
        if (audioFormat != 1) fail(s"unsupported audio format $audioFormat (PCM only)")
        channels = le16(i + 10)
        rate = le32(i + 12).toInt
        bits = le16(i + 22)
        if (channels < 1 || rate < 1) fail(s"bad fmt: channels=$channels rate=$rate")
        if (bits != 16) fail(s"unsupported bit depth $bits (PCM16 only)")
      } else if (id == "data") {
        if (i + 8 + len > p.length) fail("data chunk truncated")
        dataOff = i + 8
        dataLen = len.toInt
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (channels < 0) fail("no fmt chunk")
    if (dataOff < 0) fail("no data chunk")
    val frames = dataLen / (2 * channels)
    val mono = new Array[Int](frames)
    var f = 0
    while (f < frames) {
      var acc = 0
      var c = 0
      while (c < channels) {
        val off = dataOff + (f * channels + c) * 2
        acc += (le16(off) << 16) >> 16 // sign-extend int16
        c += 1
      }
      mono(f) = acc / channels
      f += 1
    }
    WavClip(rate, channels, mono)
  }

  // ---------------------------------------------------------------------
  // Closed-form synthesis (the q30/q101 canvas discipline): each doc
  // renders as a REAL mono PCM16 WAV whose samples are an arithmetic
  // function of the text bytes — s(k) = (byte(k) − 100)·200 (zero-padded
  // to one sample minimum) — so the DuckDB oracle recomputes stats and
  // fingerprint from `ascii(substr(text, …))` without parsing a byte.
  // ---------------------------------------------------------------------

  /** One WAV payload per doc, samples closed-form in the text bytes. */
  def toWavPayloads(spark: SparkSession, docs: DataFrame): Dataset[MediaPayload] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.max(1, bytes.length)
        val samples = new Array[Int](n)
        var k = 0
        while (k < bytes.length) {
          samples(k) = ((bytes(k) & 0xff) - 100) * 200
          k += 1
        }
        MediaPayload(id, encodePcm16Wav(SampleRate, samples), "audio/wav")
      })
  }

  // ---------------------------------------------------------------------
  // Stats + fingerprint over decoded samples.
  // ---------------------------------------------------------------------

  /** 60-bit energy-envelope difference hash: frame f covers samples
    * [f·n/61, (f+1)·n/61) (nearest-sample bounds — integer-exact, well-
    * defined for ANY n ≥ 1; short clips just leave empty zero-energy
    * frames), bit f set when e(f) > e(f+1). All-long arithmetic: |s| ≤
    * 2¹⁵ so a frame's Σs² stays far under 2⁶³ at any clip length the
    * int-indexed decode admits.
    */
  def energyHash60(samples: Array[Int]): Long = {
    val n = samples.length
    val e = new Array[Long](FrameCount)
    var f = 0
    while (f < FrameCount) {
      // long frame-bound math: f*n overflows Int past ~35.8M samples
      // (~75 min at 8 kHz) and a negative index would kill the scan
      val from = (f.toLong * n / FrameCount).toInt
      val until = ((f + 1).toLong * n / FrameCount).toInt
      var k = from
      var acc = 0L
      while (k < until) { val s = samples(k).toLong; acc += s * s; k += 1 }
      e(f) = acc
      f += 1
    }
    var hash = 0L
    f = 0
    while (f < FrameCount - 1) {
      if (e(f) > e(f + 1)) hash |= 1L << f
      f += 1
    }
    hash
  }

  /** Per-clip decode → stats + fingerprint, one per-partition scan:
    * (doc_id, sample_rate, n_samples, peak, sum_sq, n_zero_crossings,
    * fp). `peak` = max |s|; `n_zero_crossings` counts strict sign flips
    * (s(k−1)·s(k) < 0); `sum_sq` is the exact Σs² (the caller derives
    * rms = √(sum_sq/n) so the one inexact op happens once, in a fixed
    * order both engines share).
    */
  def clipRows(payloads: Dataset[MediaPayload]): Dataset[ClipRow] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions(_.map(clipRowOf))
  }

  /** Decode with MEMBER-LEVEL quarantine (the i17/q101 discipline): a
    * corrupt clip yields (doc_id, null…, error) instead of failing the
    * scan. Only the decoder's NAMED rejections are caught.
    */
  def clipRowsWithErrors(payloads: Dataset[MediaPayload]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions(_.map { mp =>
        try {
          val r = clipRowOf(mp)
          (mp.doc_id, Option(r), Option.empty[String])
        } catch {
          case e: IllegalArgumentException =>
            (mp.doc_id, Option.empty[ClipRow], Option(e.getMessage))
        }
      })
      .toDF("doc_id", "clip", "decode_error")
  }

  private def clipRowOf(mp: MediaPayload): ClipRow = {
    val clip = decodeWavSamples(mp.payload)
    val s = clip.samples
    var peak = 0
    var sumSq = 0L
    var zc = 0
    var k = 0
    while (k < s.length) {
      val v = s(k)
      if (math.abs(v) > peak) peak = math.abs(v)
      sumSq += v.toLong * v
      if (k > 0 && s(k - 1).toLong * v < 0) zc += 1
      k += 1
    }
    ClipRow(mp.doc_id, clip.sampleRate, s.length, peak, sumSq, zc, energyHash60(s))
  }

  /** Near-duplicate clip pairs within `maxHamming`: delegates banding,
    * the bucket cap, and Hamming verification to [[SimHash.nearPairs]].
    */
  def nearPairs(clips: DataFrame, maxHamming: Int,
      maxBucket: Option[Int] = Some(SimHash.BandBucketCap)): DataFrame =
    SimHash.nearPairs(clips.select(col("doc_id"), col("fp").as("simhash")),
      "doc_id", maxHamming, maxBucket)

  /** (doc_id, fp, band, band_val) rows — the 6 × 10-bit banding of
    * [[SimHash]], public for asymmetric (new-batch vs accumulated-index)
    * joins like the s30 streaming sink (the [[ImageHash.bandRows]] shape).
    */
  def bandRows(clips: DataFrame): DataFrame =
    SimHash.bandRowsOf(clips, "doc_id", "fp")

  /** Over-cap star side channel ([[SimHash.overCapPairs]]). */
  def overCapPairs(clips: DataFrame, maxHamming: Int,
      cap: Int = SimHash.BandBucketCap): DataFrame =
    SimHash.overCapPairs(clips.select(col("doc_id"), col("fp").as("simhash")),
      "doc_id", maxHamming, cap)

  /** Survivorship verdicts over the audio near-dup graph — the
    * q39/q63/q101 discipline: connected components of
    * [[nearPairs]] ∪ [[overCapPairs]], min-id survivor per component:
    * (doc_id, keep, dup_of).
    */
  def keepSet(clips: DataFrame, maxHamming: Int,
      maxBucket: Option[Int] = Some(SimHash.BandBucketCap)): DataFrame =
    SimHash.keepSetOf(clips, "doc_id", "fp", maxHamming, maxBucket)
}
