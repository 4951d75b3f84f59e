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
  // AIFF / AU (r18): the javax.sound.sampled SEAM, mirroring the ImageIO
  // seam in Binary — headers are validated by OUR named parsers FIRST
  // (truncation/corruption keeps its exact diagnosis; the JDK's
  // UnsupportedAudioFileException names nothing), then the sample decode
  // itself rides the JDK codec. WAV stays on the pure-JVM PCM16 parser;
  // [[decodeAudioSamples]] dispatches on the container magic, so
  // q111/q123/s30 consume any supported container through one entry
  // point with identical downstream stats/fingerprint math.
  // ---------------------------------------------------------------------

  /** Container sniff + decode: RIFF/WAVE → the pure PCM16 parser;
    * FORM/AIFF and .snd (AU) → named header validation then the
    * javax.sound.sampled decode. Unknown magic fails NAMED.
    */
  def decodeAudioSamples(p: Array[Byte]): WavClip = {
    if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F')
      decodeWavSamples(p)
    else if (p.length >= 4 && p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') {
      validateAiff(p); decodeViaJdk(p, "aiff")
    } else if (p.length >= 4 && p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd') {
      validateAu(p); decodeViaJdk(p, "au")
    } else throw new IllegalArgumentException(
      "audio: unknown container magic (RIFF/WAVE, FORM/AIFF, .snd supported)")
  }

  private def be16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
  private def be32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

  /** Named AIFF header validation (big-endian IFF: FORM/AIFF, COMM with
    * the 80-bit extended-float rate, SSND) — the exact-diagnosis gate in
    * front of the JDK seam. AIFC (compressed) is rejected named.
    */
  private[multimodal] def validateAiff(p: Array[Byte]): Unit = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"aiff: $msg")
    if (p.length < 12) fail("truncated FORM header")
    val form = new String(p, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (form == "AIFC") fail("AIFC (compressed) unsupported")
    if (form != "AIFF") fail(s"not an AIFF form: $form")
    var i = 12
    var sawComm = false
    var sawSsnd = false
    while (i + 8 <= p.length) {
      val id = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = be32(p, i + 4)
      if (len > p.length - i - 8) fail(s"chunk $id truncated or over-long: $len")
      if (id == "COMM") {
        if (len < 18) fail("COMM chunk truncated")
        val channels = be16(p, i + 8)
        val bits = be16(p, i + 14)
        val rate = extended80(p, i + 16)
        if (channels < 1) fail(s"bad channel count $channels")
        if (bits != 16) fail(s"unsupported bit depth $bits (PCM16 only)")
        if (!(rate >= 1.0)) fail(s"bad sample rate $rate")
        sawComm = true
      } else if (id == "SSND") {
        if (len < 8) fail("SSND chunk truncated")
        sawSsnd = true
      }
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (!sawComm) fail("no COMM chunk")
    if (!sawSsnd) fail("no SSND chunk")
  }

  /** IEEE 754 80-bit extended float (the AIFF rate field): value =
    * mantissa × 2^(exp − 16383 − 63).
    */
  private def extended80(p: Array[Byte], off: Int): Double = {
    val exp = be16(p, off) & 0x7fff
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (p(off + 2 + i) & 0xffL); i += 1 }
    if (exp == 0 && mant == 0L) 0.0
    else {
      // mant's top bit is the explicit integer bit; treat as unsigned
      val m = if (mant < 0) mant.toDouble + math.pow(2.0, 64) else mant.toDouble
      m * math.pow(2.0, exp - 16383 - 63)
    }
  }

  /** Named AU (.snd) header validation: 24-byte big-endian header, 16-bit
    * linear PCM (encoding 3) only.
    */
  private[multimodal] def validateAu(p: Array[Byte]): Unit = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"au: $msg")
    if (p.length < 24) fail("truncated header")
    val dataOff = be32(p, 4)
    val enc = be32(p, 12)
    val rate = be32(p, 16)
    val channels = be32(p, 20)
    if (dataOff < 24 || dataOff > p.length) fail(s"bad data offset $dataOff")
    if (enc != 3) fail(s"unsupported encoding $enc (16-bit linear PCM only)")
    if (rate < 1) fail(s"bad sample rate $rate")
    if (channels < 1) fail(s"bad channel count $channels")
  }

  /** The JDK seam: decode an already-header-validated container through
    * javax.sound.sampled, folding to mono with the SAME truncating
    * integer average as the WAV path (cross-container stats parity is
    * spec-pinned). Residual JDK failures (a corruption the header walk
    * can't see) rewrap NAMED.
    */
  private def decodeViaJdk(p: Array[Byte], kind: String): WavClip = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais = try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(p))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$kind: jdk decoder rejected the payload: ${e.getMessage}")
    }
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED || fmt.getSampleSizeInBits != 16)
        throw new IllegalArgumentException(
          s"$kind: unsupported format ${fmt.getEncoding}/${fmt.getSampleSizeInBits}-bit (PCM16 only)")
      val channels = fmt.getChannels
      val bytes = {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = ais.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = ais.read(tmp) }
        buf.toByteArray
      }
      val frames = bytes.length / (2 * channels)
      val big = fmt.isBigEndian
      val mono = new Array[Int](frames)
      var f = 0
      while (f < frames) {
        var acc = 0
        var c = 0
        while (c < channels) {
          val off = (f * channels + c) * 2
          val raw =
            if (big) ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
            else (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
          acc += (raw << 16) >> 16 // sign-extend int16
          c += 1
        }
        mono(f) = acc / channels
        f += 1
      }
      WavClip(math.round(fmt.getSampleRate).toInt, channels, mono)
    } finally ais.close()
  }

  /** Spec-valid PCM16 big-endian mono AIFF (FORM/AIFF + COMM + SSND) —
    * the fixture encoder the parity spec decodes through BOTH our
    * dispatcher and the raw JDK reader.
    */
  def encodePcm16Aiff(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val ssndLen = 8 + dataLen
    val formLen = 4 + (8 + 18) + (8 + ssndLen)
    val out = new Array[Byte](8 + formLen)
    def tag(off: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, out, off, 4)
    }
    def put32(off: Int, v: Long): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v >>> 8).toByte; out(off + 1) = v.toByte
    }
    tag(0, "FORM"); put32(4, formLen); tag(8, "AIFF")
    tag(12, "COMM"); put32(16, 18)
    put16(20, 1) // channels
    put32(22, samples.length) // frames
    put16(26, 16) // bits
    // 80-bit extended rate: exponent 16383+pos, mantissa rate << (63-pos)
    val pos = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    put16(28, 16383 + pos)
    val mant = sampleRate.toLong << (63 - pos)
    var i = 0
    while (i < 8) { out(30 + i) = (mant >>> (56 - 8 * i)).toByte; i += 1 }
    tag(38, "SSND"); put32(42, ssndLen); put32(46, 0); put32(50, 0)
    i = 0
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      put16(54 + i * 2, s)
      i += 1
    }
    out
  }

  /** Spec-valid 16-bit linear PCM big-endian mono AU (.snd). */
  def encodePcm16Au(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](24 + dataLen)
    def put32(off: Int, v: Long): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    out(0) = '.'; out(1) = 's'; out(2) = 'n'; out(3) = 'd'
    put32(4, 24); put32(8, dataLen); put32(12, 3)
    put32(16, sampleRate); put32(20, 1)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      out(24 + i * 2) = (s >>> 8).toByte; out(25 + i * 2) = s.toByte
      i += 1
    }
    out
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
    // NOT widened (r22 A/B, driver-shaped): WAV synthesis is one linear
    // byte→sample pass per doc — the exchange cost more than the spread
    // repaid (q123 0.19→0.12 s on removal, q111 flat), and at scale the
    // scan already has splits so the widen bought nothing.
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
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
    val clip = decodeAudioSamples(mp.payload)
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
