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
      checksum: String, feature: Array[Float])

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
      // per-partition init (codec handles, model, ...) — here the digest
      // instance, reset per row, exactly how a real decoder amortizes
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val d = digest.digest(r.payload) // md5: independently computable
        val checksum = d.map("%02x".format(_)).mkString
        val feature = Array.tabulate(featureDim) { i =>
          // ??? real decoder goes here — deterministic fake feature
          // from the digest bytes (unsigned), centered and scaled
          (((d(i % d.length) & 0xff) - 128).toFloat) / 128f
        }
        DecodedRow(r.doc_id, r.media_type, r.payload.length, checksum, feature)
      }
    }
  }

  case class ResizedRow(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, payload: Array[Byte])

  /** Resize stage: aspect-preserving target box computation is real;
    * the pixel resample itself is stubbed (no codec in this image) with
    * a deterministic byte fold. Batch shape matches a real resampler:
    * one iterator per partition, init amortized per partition.
    */
  def resize(media: DataFrame, maxSide: Int): Dataset[ResizedRow] = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ResizedRow]
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val scale = math.min(1.0, maxSide.toDouble / math.max(r.width, r.height))
        val (ow, oh) = (math.max(1, (r.width * scale).toInt),
          math.max(1, (r.height * scale).toInt))
        // ??? real resample goes here — deterministic fake keeps bytes
        val out = if (r.payload.length <= 16) r.payload
          else r.payload.take(16)
        ResizedRow(r.doc_id, r.width, r.height, ow, oh, out)
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Frame-sampling stage for video payloads: emits every `everyMs`
    * "frame" as its own row (one row in → many out, the real fan-out
    * shape); frame bytes are a deterministic stub slice.
    */
  def sampleFrames(media: DataFrame, durationMs: Long, everyMs: Long): Dataset[FrameRow] = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[FrameRow]
    media.as[MediaRow].filter(_.media_type == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        (0L until durationMs by everyMs).zipWithIndex.map { case (ts, i) =>
          // ??? real frame decode goes here — stub slices the payload
          val off = (i * 4) % math.max(1, r.payload.length)
          FrameRow(r.doc_id, i, ts, r.payload.drop(off).take(8))
        }.iterator
      }
    }
  }

  /** End-to-end pipeline: attach → repartition by media type (a real
    * cluster routes video to beefier executors) → batched decode, plus
    * the one-to-many frame fan-out for video rows — every stage's
    * output lands in the verified result (n_frames counts the sampled
    * frames per video; 0 for stills/audio).
    */
  def pipeline(docs: DataFrame, id: String, text: String): DataFrame = {
    val media = attachPayloads(docs, id, text).repartition(col("media_type"))
    val frames = sampleFrames(media, durationMs = 1000, everyMs = 250).toDF()
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    decodeFeatures(media).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes").cast("long"),
        col("checksum"), col("feature")(0).cast("double").as("f0"))
      .join(frames, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_frames"))
  }
}
