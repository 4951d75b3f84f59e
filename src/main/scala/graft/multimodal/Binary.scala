package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded per partition.
  *
  * The Spark-side plumbing is real — typed Encoders, binary schema,
  * mapPartitions batch shape (one decoder instantiation per partition, the
  * shape a JNI/FFMPEG/image codec binding needs). The decode itself is a
  * clearly-marked deterministic STUB (`fakeDecode`): the real image/audio
  * libraries are not in this environment, so it derives metadata from an md5
  * of the payload. Swap `fakeDecode` for a codec call to productionize.
  */
object Binary {

  final case class MediaPayload(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int, format: String)

  /** Wrap a text corpus as opaque binary payloads (UTF-8 bytes). */
  def toPayloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** STUB decode: deterministic fake metadata from the payload hash.
    * Mirrors the SQL fake-decode in SimQueries.q30 exactly (same md5-prefix
    * hash), so the mapPartitions path is testable against the oracle.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, String) = {
    val hex = MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val width = (320 + h % 1600).toInt
    val height = (240 + (h / 1600) % 840).toInt
    val format = (h % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" }
    (width, height, format)
  }

  /** Partition-batched decode: the real-codec shape (iterator in, iterator
    * out, decoder state amortized per partition — never per row).
    */
  def decodeMeta(payloads: Dataset[MediaPayload]): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      // Real impl: instantiate the codec ONCE here, then stream the batch.
      it.map { p =>
        val (w, h, f) = fakeDecode(p.payload)
        MediaMeta(p.doc_id, p.payload.length, w, h, f)
      }
    }
  }

  /** Frame sampling over an opaque payload — the video-keyframe shape:
    * slice the payload at `stride` intervals, take `frameLen` bytes per
    * slice, and feature-extract each sampled frame (STUB: hash60 of the
    * frame bytes; a real pipeline swaps in a decoder + embedding model per
    * frame batch). Payloads here are the ASCII text corpus, so character
    * slicing == byte slicing (asserted by the oracle's octet math).
    *
    * Returns (doc_id, frame_id, feat) rows — one per SAMPLED frame, so
    * downstream cost scales with the sampling rate, not the media size.
    */
  def sampleFrames(docs: DataFrame, frameLen: Int, stride: Int): DataFrame =
    docs
      .withColumn("_len", length(col("text")))
      .filter(col("_len") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), col("_len"), lit(stride))).as("fpos"))
      .select(col("doc_id"),
        expr(s"(fpos - 1) div $stride").as("frame_id"),
        graft.ops.Cdm.hash60(col("text").substr(col("fpos"), lit(frameLen))).as("feat"))

  /** End-to-end: documents → payloads → typed decode. */
  def metadata(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    decodeMeta(toPayloads(docs).as[MediaPayload])
  }
}
