package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with a partition-batched decode/feature-extract stage.
  *
  * Image decode/resize are REAL (`javax.imageio` PNG round-trip) and so
  * is audio decode (`javax.sound.sampled` WAV/PCM — both ship with
  * every JDK, no external codec): image rows carry actual PNG bytes
  * rendered from a deterministic gradient fixture, audio rows carry a
  * real RIFF/WAVE file wrapping a deterministic 8-bit PCM ramp, and the
  * decode stage parses them with `ImageIO.read` /
  * `AudioSystem.getAudioInputStream`, deriving every checked column
  * (dims, sample count, checksum, mean) from the decoded raster or PCM
  * frames. Video decode is REAL too: rows carry an uncompressed
  * RIFF/AVI file (written and re-parsed by the same hand-rolled RIFF
  * chunk discipline as the WAVE path — no JDK video codec exists, but
  * AVI's container is plain RIFF and its DIB frames are plain
  * bitmaps), and every checked column derives from the parsed frames.
  * The Spark-side shape — binary column schema, metadata struct, typed
  * `mapPartitions` batching (the Scala analogue of `mapInPandas`: one
  * iterator per partition so codec/model init amortizes, exactly how a
  * GPU feature extractor is wired), and the per-media-type
  * partitioning contract — is identical for all three. The md5 path
  * remains only as the degrade-to-opaque fallback for genuinely coded
  * formats.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, width: Int,
      height: Int, payload: Array[Byte])

  case class DecodedRow(doc_id: Long, media_type: String, n_bytes: Int,
      checksum: String, px_mean: Double, img_w: Int, img_h: Int,
      feature: Array[Float])

  /** Attach a binary payload + metadata to each document. Image rows
    * get a REAL PNG, audio rows a REAL WAV, video rows a REAL
    * uncompressed RIFF/AVI (all rendered per partition — stands in
    * for fetching media bytes from object storage). Fixture dims and
    * pixel/sample content are pure functions of the id, so an oracle
    * can predict what a correct decode must recover.
    */
  def attachPayloads(docs: DataFrame, id: String, text: String): DataFrame = {
    val meta = docs.select(
      col(id).as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(id), lit(3)) + 1).cast("int")).as("media_type"),
      (pmod(col(id), lit(16)) + 8).cast("int").as("width"),
      (pmod(floor(col(id) / lit(16)), lit(16)) + 8).cast("int").as("height"),
      encode(concat(lit("MEDIA:"), col(id).cast("string"), lit(":"),
        substring(col(text), 1, 64)), "UTF-8").as("payload"))
    implicit val enc = Encoders.product[MediaRow]
    meta.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false) // no temp-file cache inside tasks
      rows.map { r =>
        r.media_type match {
          case "image" => r.copy(payload = renderPng(r.doc_id, r.width, r.height))
          case "audio" => r.copy(payload = renderWav(r.doc_id, r.width, r.height))
          case "video" => r.copy(payload = renderAvi(r.doc_id, r.width, r.height))
          case _ => r
        }
      }
    }.toDF()
  }

  /** Deterministic grayscale gradient fixture: pixel(x, y) =
    * base + x + y with base = id % 128 (dims ≤ 23 keep values < 256),
    * PNG-encoded. The pixel sum has the closed form
    * w*h*base + h*w(w-1)/2 + w*h(h-1)/2, so SQL can verify a decode.
    */
  private def renderPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val base = (docId % 128).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, base + x + y); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic PCM ramp fixture wrapped in a REAL RIFF/WAVE file
    * (`javax.sound.sampled` writes and reads WAV in every JDK): 8-bit
    * unsigned mono at 8 kHz, `n = w*h*4` samples, sample(i) =
    * base + (i % 13) with base = id % 128. The sample sum has the
    * closed form `base*n + 78*(n/13) + r*(r-1)/2` (r = n mod 13), so
    * SQL can verify a decode.
    */
  private def renderWav(docId: Long, w: Int, h: Int): Array[Byte] = {
    import javax.sound.sampled._
    val base = (docId % 128).toInt
    val n = w * h * 4
    val pcm = new Array[Byte](n)
    var i = 0
    while (i < n) { pcm(i) = (base + (i % 13)).toByte; i += 1 }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic VIDEO fixture: a REAL uncompressed RIFF/AVI file
    * (the same hand-rolled chunk discipline as the WAVE path — AVI's
    * container IS RIFF), 8-bit palettized DIB frames, `frames`
    * frames at 4 fps, frame f pixel (x, y) = base + x + y + f with
    * base = id % 128 (dims ≤ 23 and frames ≤ 4 keep values < 256).
    * The all-frames pixel sum has the closed form
    * `F·(w·h·base + h·w(w−1)/2 + w·h(h−1)/2) + w·h·F(F−1)/2`, so SQL
    * can verify a decode. Layout written here and re-parsed by
    * [[decodeAvi]]: RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh
    * 'vids'/'DIB ', strf BITMAPINFOHEADER+256-gray palette}} →
    * LIST(movi){'00db' bottom-up DIB frames, 4-byte row stride}.
    */
  private[ops] def renderAvi(docId: Long, w: Int, h: Int, frames: Int = 4): Array[Byte] = {
    val base = (docId % 128).toInt
    val stride = (w + 3) & ~3
    val frameBytes = stride * h
    val out = new ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))

    // sizes, innermost out: strf = 40 BITMAPINFOHEADER + 256 RGBQUAD
    val strfSz = 40 + 256 * 4
    val strlSz = 4 + (8 + 56) + (8 + strfSz)       // 'strl' + strh + strf
    val hdrlSz = 4 + (8 + 56) + (8 + strlSz)       // 'hdrl' + avih + LIST strl
    val moviSz = 4 + frames * (8 + frameBytes)     // 'movi' + 00db chunks
    val riffSz = 4 + (8 + hdrlSz) + (8 + moviSz)   // 'AVI ' + LIST hdrl + LIST movi

    fourcc("RIFF"); le32(riffSz); fourcc("AVI ")
    fourcc("LIST"); le32(hdrlSz); fourcc("hdrl")
    fourcc("avih"); le32(56)
    le32(250000); le32(frameBytes * 4); le32(0); le32(0) // µs/frame, bytes/sec, pad, flags
    le32(frames); le32(0); le32(1); le32(frameBytes)     // totalFrames, initial, streams, bufSize
    le32(w); le32(h); le32(0); le32(0); le32(0); le32(0) // dims + 4 reserved
    fourcc("LIST"); le32(strlSz); fourcc("strl")
    fourcc("strh"); le32(56)
    fourcc("vids"); fourcc("DIB "); le32(0); le32(0)     // type, handler, flags, prio/lang
    le32(0); le32(1); le32(4); le32(0)                   // initialFrames, scale, rate (4 fps), start
    le32(frames); le32(frameBytes); le32(-1); le32(0)    // length, bufSize, quality, sampleSize
    le32(0); le32(w | (h << 16))                         // rcFrame: (0,0)-(w,h) as 4 int16s
    fourcc("strf"); le32(strfSz)
    le32(40); le32(w); le32(h); le32((8 << 16) | 1)      // biSize, w, h, planes=1|bpp=8
    le32(0); le32(frameBytes); le32(0); le32(0)          // BI_RGB, sizeImage, ppm x/y
    le32(256); le32(0)                                   // clrUsed, clrImportant
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); out.write(0); c += 1 } // gray RGBQUADs
    fourcc("LIST"); le32(moviSz); fourcc("movi")
    var f = 0
    while (f < frames) {
      fourcc("00db"); le32(frameBytes)
      var y = h - 1                                      // DIB rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < stride) {
          out.write(if (x < w) base + x + y + f else 0)  // stride padding is zeros
          x += 1
        }
        y -= 1
      }
      f += 1
    }
    out.toByteArray
  }

  private[ops] case class AviFrames(width: Int, height: Int, frames: Array[Array[Int]])

  /** A real RIFF/AVI chunk-walk parse (the video analogue of the WAVE
    * parser): validates RIFF/'AVI ', reads dims + bit depth from the
    * BITMAPINFOHEADER in strf, then decodes every '00db'/'00dc' movi
    * chunk as a bottom-up 8-bit DIB with 4-byte row stride, returning
    * per-frame pixel rasters (row-major, top-down). None for anything
    * malformed or compressed — one corrupt object must degrade to the
    * opaque path, never fail a 100 TB job.
    */
  private[ops] def decodeAvi(bytes: Array[Byte]): Option[AviFrames] = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    try {
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      var w = -1; var h = -1; var bpp = -1; var compression = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      // walk (listEnd-bounded) chunk sequences; LISTs recurse one level at a time
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(off); val sz = le32(off + 4)
          val body = off + 8
          // a corrupt size field (top bit set → le32 negative) would make
          // the cursor advance zero bytes (sz = -8) or walk backward
          // (sz < -9) — an unkillable task-level hang, which the
          // catch-all below cannot interrupt. Treat it like a truncated
          // leaf: stop, keep the intact prefix frames.
          if (sz < 0) return
          if (id == "LIST" && sz >= 4 && body + 4 <= end) {
            // a torn LIST (file truncated mid-stream) is CLAMPED, not
            // skipped: its intact leading children — e.g. the whole
            // frames before the tear — still parse
            val listType = fourcc(body)
            walk(body + 4, math.min(body + sz, end), inMovi || listType == "movi")
          } else if (body + sz > end) {
            return // truncated leaf chunk: stop, keep what parsed
          } else if (id == "strf" && sz >= 40) {
            w = le32(body + 4); h = le32(body + 8)
            bpp = (le32(body + 12) >>> 16) & 0xffff
            compression = le32(body + 16)
          } else if (inMovi && (id == "00db" || id == "00dc") &&
              w > 0 && h > 0 && bpp == 8 && compression == 0) {
            val stride = (w + 3) & ~3
            if (sz >= stride * h) {
              val px = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                val rowOff = body + (h - 1 - y) * stride // flip bottom-up → top-down
                var x = 0
                while (x < w) { px(y * w + x) = bytes(rowOff + x) & 0xff; x += 1 }
                y += 1
              }
              frames += px
            }
          }
          off = body + sz + (sz & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, bytes.length, inMovi = false)
      if (w > 0 && h > 0 && frames.nonEmpty) Some(AviFrames(w, h, frames.toArray))
      else None
    } catch { case _: Exception => None }
  }

  /** Partition-batched decode: iterate once per partition, REAL
    * `ImageIO.read` for image rows, a real `AudioSystem` WAV parse for
    * audio rows, and a real RIFF/AVI chunk-walk for video rows — dims,
    * sample/frame counts, checksum and mean all come from the decoded
    * raster/frames, so a broken decoder fails the oracle. Payloads no
    * parser accepts (genuinely coded formats) fall back to the md5
    * stub (independently computable).
    */
  def decodeFeatures(media: DataFrame, featureDim: Int = 8): Dataset[DecodedRow] = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[DecodedRow]
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init (codec cache config, digest instance) — the
      // same place a real decoder amortizes model/codec setup
      ImageIO.setUseCache(false)
      val digest = java.security.MessageDigest.getInstance("MD5")

      // a real WAV parse; None for bytes the JDK's reader rejects — one
      // corrupt object must degrade to the opaque path, never fail a
      // 100 TB job
      def decodeAudio(r: MediaRow): Option[DecodedRow] =
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(r.payload))
          val pcm = try ais.readAllBytes() finally ais.close()
          val n = pcm.length
          if (n == 0) None
          else {
            var sum = 0L
            val bandSum = new Array[Long](featureDim)
            val bandN = new Array[Long](featureDim)
            var i = 0
            while (i < n) {
              val v = pcm(i) & 0xff // 8-bit unsigned PCM
              // long math: i * featureDim overflows Int past ~268 MB of
              // PCM, and an AIOOBE here would escape the decode-failure
              // catch and kill the job
              sum += v; val b = (i.toLong * featureDim / n).toInt
              bandSum(b) += v; bandN(b) += 1
              i += 1
            }
            val checksum = hex(digest.digest(s"pcm:$n:$sum".getBytes("UTF-8")))
            val feature = Array.tabulate(featureDim) { i =>
              if (bandN(i) == 0) 0f
              else (bandSum(i).toDouble / bandN(i) / 255.0).toFloat
            }
            Some(DecodedRow(r.doc_id, r.media_type, n, checksum,
              sum.toDouble / n / 255.0, 0, 0, feature))
          }
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException => None
        }

      // real AVI parse → per-frame rasters; columns derive from the
      // DECODED pixels (band feature = mean over a contiguous slice of
      // the flattened frame-order pixel stream, same shape as audio)
      def decodeVideo(r: MediaRow): Option[DecodedRow] =
        decodeAvi(r.payload).map { av =>
          val nf = av.frames.length
          val n = av.width.toLong * av.height * nf
          var sum = 0L
          val bandSum = new Array[Long](featureDim)
          val bandN = new Array[Long](featureDim)
          var i = 0L
          var f = 0
          while (f < nf) {
            val px = av.frames(f)
            var j = 0
            while (j < px.length) {
              val v = px(j)
              sum += v; val b = (i * featureDim / n).toInt
              bandSum(b) += v; bandN(b) += 1
              i += 1; j += 1
            }
            f += 1
          }
          val checksum = hex(digest.digest(
            s"vid:${av.width}x${av.height}:$nf:$sum".getBytes("UTF-8")))
          val feature = Array.tabulate(featureDim) { b =>
            if (bandN(b) == 0) 0f
            else (bandSum(b).toDouble / bandN(b) / 255.0).toFloat
          }
          DecodedRow(r.doc_id, r.media_type, n.toInt, checksum,
            sum.toDouble / n / 255.0, av.width, av.height, feature)
        }

      rows.map { r =>
        // ImageIO.read returns NULL (not an exception) for bytes no
        // registered reader decodes — same degrade-to-opaque contract
        val img = if (r.media_type == "image")
          ImageIO.read(new ByteArrayInputStream(r.payload)) else null
        val audio = if (r.media_type == "audio") decodeAudio(r) else None
        val video = if (r.media_type == "video") decodeVideo(r) else None
        if (audio.isDefined) audio.get
        else if (video.isDefined) video.get
        else if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L
          val bandSum = new Array[Long](featureDim)
          val bandN = new Array[Long](featureDim)
          var y = 0
          while (y < h) {
            val band = (y.toLong * featureDim / h).toInt // long math, as decodeAudio
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              sum += v; bandSum(band) += v; bandN(band) += 1
              x += 1
            }
            y += 1
          }
          val mean = sum.toDouble / (w * h) / 255.0
          val checksum = hex(digest.digest(
            s"${w}x${h}:$sum".getBytes("UTF-8")))
          val feature = Array.tabulate(featureDim) { i =>
            if (bandN(i) == 0) 0f
            else (bandSum(i).toDouble / bandN(i) / 255.0).toFloat
          }
          DecodedRow(r.doc_id, r.media_type, w * h, checksum, mean, w, h, feature)
        } else {
          val d = digest.digest(r.payload)
          val feature = Array.tabulate(featureDim) { i =>
            (((d(i % d.length) & 0xff) - 128).toFloat) / 128f
          }
          val mean = ((d(0) & 0xff) - 128).toDouble / 128.0
          DecodedRow(r.doc_id, r.media_type, r.payload.length, hex(d),
            mean, 0, 0, feature)
        }
      }
    }
  }

  private def hex(d: Array[Byte]): String = d.map("%02x".format(_)).mkString

  case class ResizedRow(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, payload: Array[Byte])

  /** Resize stage. Image rows do a REAL decode → bilinear resample →
    * PNG re-encode; the output dims come from the resampled image
    * itself. Non-image rows keep the deterministic byte-fold stub with
    * the same integer target-box math. Batch shape matches a real
    * resampler: one iterator per partition, init amortized.
    */
  def resize(media: DataFrame, maxSide: Int): Dataset[ResizedRow] = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ResizedRow]
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val m = math.max(r.width, r.height)
        val (ow, oh) =
          if (m <= maxSide) (r.width, r.height)
          else (math.max(1, r.width * maxSide / m),
            math.max(1, r.height * maxSide / m))
        val img = if (r.media_type == "image")
          ImageIO.read(new ByteArrayInputStream(r.payload)) else null
        if (img != null) { // undecodable image bytes degrade to the stub
          val out = new BufferedImage(ow, oh, BufferedImage.TYPE_BYTE_GRAY)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, ow, oh, null)
          g.dispose()
          val bytes = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bytes)
          ResizedRow(r.doc_id, r.width, r.height, out.getWidth, out.getHeight,
            bytes.toByteArray)
        } else {
          val bytes = if (r.payload.length <= 16) r.payload else r.payload.take(16)
          ResizedRow(r.doc_id, r.width, r.height, ow, oh, bytes)
        }
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Frame-sampling stage for video payloads: a REAL AVI parse emits
    * one row per DECODED frame (one row in → many out, the real
    * fan-out shape), frame bytes = the frame's leading pixels, ts from
    * the sample cadence. Payloads no parser accepts (coded formats)
    * keep the deterministic stub fan-out, so one corrupt object
    * degrades instead of failing the job.
    */
  def sampleFrames(media: DataFrame, durationMs: Long, everyMs: Long): Dataset[FrameRow] = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[FrameRow]
    media.as[MediaRow].filter(_.media_type == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAvi(r.payload) match {
          case Some(av) =>
            av.frames.iterator.zipWithIndex.map { case (px, i) =>
              val head = px.take(8).map(v => v.toByte)
              FrameRow(r.doc_id, i, i.toLong * everyMs, head)
            }
          case None =>
            (0L until durationMs by everyMs).zipWithIndex.map { case (ts, i) =>
              val off = (i * 4) % math.max(1, r.payload.length)
              FrameRow(r.doc_id, i, ts, r.payload.drop(off).take(8))
            }.iterator
        }
      }
    }
  }

  /** End-to-end pipeline: attach → repartition by media type (a real
    * cluster routes video to beefier executors) → batched decode, plus
    * the one-to-many frame fan-out for video rows. Image rows' n_bytes,
    * checksum, f0, img_w, img_h are all functions of the DECODED pixels
    * — the oracle recomputes them from the fixture's closed form, so a
    * decode that returns wrong pixels fails the hash gate.
    */
  def pipeline(docs: DataFrame, id: String, text: String): DataFrame = {
    val media = attachPayloads(docs, id, text).repartition(col("media_type"))
    val frames = sampleFrames(media, durationMs = 1000, everyMs = 250).toDF()
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    decodeFeatures(media).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes").cast("long"),
        col("checksum"), col("px_mean").as("f0"), col("img_w"), col("img_h"))
      .join(frames, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_frames"))
  }
}
