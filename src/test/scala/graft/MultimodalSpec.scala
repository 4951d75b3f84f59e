package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Binary

/** Real-decoder coverage: hand-built PPM/BMP/WAV payloads with KNOWN
  * dimensions/stats, malformed-payload fail-fast, and the magic dispatch
  * (unknown bytes fall back to the deterministic stub).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ppm(w: Int, h: Int, fill: Int, comment: Boolean = false): Array[Byte] = {
    val hdr = (if (comment) s"P6\n# a netpbm comment\n$w $h\n255\n"
               else s"P6\n$w $h\n255\n").getBytes("US-ASCII")
    hdr ++ Array.fill(w * h * 3)(fill.toByte)
  }

  private def bmp24(w: Int, h: Int): Array[Byte] = {
    val rowStride = (w * 3 + 3) / 4 * 4 // rows pad to 4-byte boundaries
    val pixelBytes = rowStride * h
    val b = java.nio.ByteBuffer.allocate(54 + pixelBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + pixelBytes)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel offset
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.array()
  }

  private def wavPcm16(channels: Int, samples: Int, amplitude: Short): Array[Byte] = {
    val dataLen = samples * channels * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(8000).putInt(8000 * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until samples * channels).foreach(_ => b.putShort(amplitude))
    b.array()
  }

  test("parsePpm reads dimensions, supports comments, validates the raster") {
    assert(Binary.parsePpm(ppm(5, 3, 42)) == ((5, 3, "ppm")))
    assert(Binary.parsePpm(ppm(7, 2, 0, comment = true)) == ((7, 2, "ppm")))
    val truncated = ppm(5, 3, 42).dropRight(1)
    val e = intercept[IllegalArgumentException](Binary.parsePpm(truncated))
    assert(e.getMessage.contains("raster truncated"))
    assert(Binary.ppmMeanByte(ppm(4, 4, 100)) == 100.0)
  }

  test("parseBmp reads 24-bit uncompressed headers, rejects compressed") {
    assert(Binary.parseBmp(bmp24(17, 9)) == ((17, 9, "bmp")))
    val rle = bmp24(4, 4)
    rle(30) = 1 // BI_RLE8
    val e = intercept[IllegalArgumentException](Binary.parseBmp(rle))
    assert(e.getMessage.contains("unsupported compression"))
  }

  test("parseWav walks chunks, reports samples-per-channel and channels, computes RMS") {
    val mono = wavPcm16(1, 100, 1000)
    assert(Binary.parseWav(mono) == ((100, 1, "wav")))
    assert(math.abs(Binary.wavRmsPcm16(mono) - 1000.0) < 1e-9)
    val stereo = wavPcm16(2, 50, -200)
    assert(Binary.parseWav(stereo) == ((50, 2, "wav")))
    assert(math.abs(Binary.wavRmsPcm16(stereo) - 200.0) < 1e-9)
    val bad = mono.take(40) // truncated data chunk
    intercept[IllegalArgumentException](Binary.parseWav(bad))
  }

  test("decodePayload dispatches on magic; unknown bytes take the stub fallback") {
    assert(Binary.decodePayload(ppm(3, 2, 1))._3 == "ppm")
    assert(Binary.decodePayload(bmp24(3, 2))._3 == "bmp")
    assert(Binary.decodePayload(wavPcm16(1, 10, 5))._3 == "wav")
    val unknown = "just some text".getBytes("UTF-8")
    val (w, h, f) = Binary.decodePayload(unknown)
    assert(Seq("jpeg", "png", "webp").contains(f) && w >= 320 && h >= 240)
    assert(Binary.decodePayload(unknown) == Binary.fakeDecode(unknown))
  }

  test("decodeMeta end-to-end over a mixed-format payload batch (mapPartitions path)") {
    val rows = Seq(
      Binary.MediaPayload(1L, ppm(6, 4, 9), "image/ppm"),
      Binary.MediaPayload(2L, bmp24(8, 5), "image/bmp"),
      Binary.MediaPayload(3L, wavPcm16(2, 30, 7), "audio/wav"),
      Binary.MediaPayload(4L, "opaque".getBytes("UTF-8"), "application/octet-stream"))
    val out = Binary.decodeMeta(rows.toDS()).collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).width == 6 && out(1L).height == 4 && out(1L).format == "ppm")
    assert(out(2L).width == 8 && out(2L).height == 5 && out(2L).format == "bmp")
    assert(out(3L).width == 30 && out(3L).height == 2 && out(3L).format == "wav")
    assert(Seq("jpeg", "png", "webp").contains(out(4L).format))
    assert(out.values.forall(m => m.byte_len > 0))
  }

  test("toPpmPayloads renders spec-valid images whose raster is the text bytes") {
    val docs = Seq((1L, "hello world"), (2L, "x" * 200), (3L, "")).toDF("doc_id", "text")
    val ps = Binary.toPpmPayloads(spark, docs).collect().map(p => p.doc_id -> p.payload).toMap
    ps.values.foreach(p => assert(Binary.parsePpm(p)._3 == "ppm"))
    assert(Binary.parsePpm(ps(2L)) == ((32, 3, "ppm"))) // 200 bytes → 3 rows of 96
    assert(Binary.parsePpm(ps(3L)) == ((32, 1, "ppm"))) // empty text → 1 blank row
    // raster round-trips the text: mean byte = sum(text bytes)/raster size
    val text = "hello world".getBytes("UTF-8")
    val expect = text.map(_ & 0xff).sum.toDouble / 96
    assert(math.abs(Binary.ppmMeanByte(ps(1L)) - expect) < 1e-9)
  }
}
