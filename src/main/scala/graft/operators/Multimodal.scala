package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time via mapPartitions (the
  * Scala analogue of a vectorized pandas UDF). The actual media codecs are
  * NOT available in this environment, so the decode step is a clearly
  * marked deterministic STUB — everything around it (schema, batch
  * iteration, partitioning, feature shape) is the real pipeline.
  */
object Multimodal {

  /** typed metadata accompanying an opaque media payload */
  final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class FeatureRow(doc_id: Long, feature: Array[Float], n_frames: Int)

  /** Attach an opaque binary payload + typed metadata to each document.
    * (The fixture has no real media, so the payload is the utf-8 text —
    * the schema and plumbing are what's exercised.)
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("img/fake").as("format"),
        lit(64).as("width"),
        lit(64).as("height"),
        length(col("text")).cast("long").as("nBytes")).as("meta"))

  /** STUB decoder: stands in for image decode + feature extraction.
    * Deterministic fake: a 16-dim feature derived from byte statistics.
    * A real deployment swaps only this function body for e.g. a JNI/ONNX
    * call — the batch shape (Iterator of rows per partition, reused
    * buffers) is already production-form.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      f(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Batch feature extraction over partitions. Partition-parallel, no
    * shuffle; at 100 TB this is a map-only stage whose parallelism is the
    * input split count.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[FeatureRow] = {
    implicit val enc = Encoders.product[FeatureRow]
    media.select(col("doc_id"), col("payload")).as(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          FeatureRow(id, decodeStub(payload, dim), n_frames = 1)
        }
      }
  }

  /** STUB resize: stands in for an image rescale. The fake keeps the
    * contract real — output payload length is exactly
    * ceil(nBytes·(w'·h')/(w·h)) and metadata is rewritten to the target
    * dims — so schema/size invariants downstream code relies on are
    * enforced and testable. A real deployment swaps the byte loop for a
    * codec call; the mapPartitions batch shape is already production-form.
    */
  def resize(spark: SparkSession, media: DataFrame,
      targetW: Int, targetH: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.select(col("doc_id"), col("payload"), col("meta"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val scale = targetW.toLong * targetH /
            (r.meta.width.toLong * r.meta.height).toDouble
          val outLen = math.max(1, math.ceil(r.payload.length * scale).toInt)
          val out = new Array[Byte](outLen)
          // empty payload keeps the 1-byte floor as zeros (sampling from
          // an empty array would index at -1)
          if (r.payload.nonEmpty) {
            var i = 0
            while (i < outLen) {
              // nearest-neighbor byte sampling — deterministic stand-in
              out(i) = r.payload((i * r.payload.length / outLen).min(r.payload.length - 1))
              i += 1
            }
          }
          MediaRow(r.doc_id, out,
            MediaMeta(r.meta.format, targetW, targetH, outLen.toLong))
        }
      }
  }

  /** Frame sampling for video-like payloads: emit every nth chunk as a
    * "frame" row (flatMap — the MultiSelection shape from the reference,
    * applied to media).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, chunk: Int = 64,
      stride: Int = 4): DataFrame =
    media.select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          greatest((length(col("payload")) / chunk - 1).cast("int"), lit(0)),
          lit(stride))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        col("payload").substr(col("frame_no") * chunk + 1, lit(chunk)).as("frame"))
}
