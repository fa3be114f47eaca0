package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with a partition-batched decode/feature-extract stage.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake, but everything Spark-side is
  * real: the binary column schema, the metadata struct, the typed
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas` —
  * one iterator per partition so a real decoder could amortize model /
  * codec initialization per partition, exactly how a GPU feature
  * extractor would be wired), and the partitioning contract.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, width: Int,
      height: Int, payload: Array[Byte])

  case class DecodedRow(doc_id: Long, media_type: String, n_bytes: Int,
      checksum: Long, feature: Array[Float])

  /** Attach a synthetic binary payload + metadata to each document —
    * stands in for reading real image/audio bytes from object storage.
    * Deterministic: payload bytes derive from the doc id and text.
    */
  def attachPayloads(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(id), lit(3)) + 1).cast("int")).as("media_type"),
      (pmod(xxhash64(col(id)), lit(512)) + 64).cast("int").as("width"),
      (pmod(xxhash64(col(id), lit(1)), lit(512)) + 64).cast("int").as("height"),
      encode(concat(lit("MEDIA:"), col(id).cast("string"), lit(":"),
        substring(col(text), 1, 64)), "UTF-8").as("payload"))

  /** Partition-batched "decode": iterate once per partition, produce a
    * fixed-size feature vector per row. A real implementation replaces
    * `fakeDecode` with a codec call; the batching shape stays identical.
    */
  def decodeFeatures(media: DataFrame, featureDim: Int = 8): Dataset[DecodedRow] = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[DecodedRow]
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would happen here (codec handles, model, ...)
      rows.map { r =>
        val checksum = r.payload.foldLeft(1469598103934665603L)((h, b) =>
          (h ^ (b & 0xff)) * 1099511628211L) // FNV-1a, deterministic stub
        val feature = Array.tabulate(featureDim) { i =>
          // ??? real decoder goes here — deterministic fake feature:
          (((checksum >>> (i * 8)) & 0xff).toFloat - 128f) / 128f
        }
        DecodedRow(r.doc_id, r.media_type, r.payload.length, checksum, feature)
      }
    }
  }

  /** End-to-end pipeline: attach → repartition by media type (a real
    * cluster routes video to beefier executors) → batched decode →
    * per-type feature stats.
    */
  def pipeline(docs: DataFrame, id: String, text: String): DataFrame = {
    val media = attachPayloads(docs, id, text).repartition(col("media_type"))
    decodeFeatures(media).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("checksum"),
        col("feature")(0).as("f0"))
  }
}
