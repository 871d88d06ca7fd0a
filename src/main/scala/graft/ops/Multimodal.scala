package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * Image and audio decode are REAL for the formats the JDK ships codecs for:
  * `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP) and `javax.sound.sampled`
  * (WAV/AIFF/AU PCM). Payloads those codecs cannot parse — including the
  * synthetic hash-stretch corpus used in tests — fall back to a
  * clearly-marked deterministic STUB that derives "decoded" properties from
  * the payload bytes, so pipelines exercise realistic row widths everywhere
  * and heavier codecs (video containers, EXR, Opus…) swap in without
  * touching any plumbing. Video frame EXTRACTION is real for animated GIF
  * (the JDK's only multi-frame codec, per-frame delay metadata and all);
  * true containers (mp4/webm) need a demuxer the JDK lacks and fall back
  * to the stub.
  *
  * Scale notes: payloads stay columnar (parquet binary) end to end; feature
  * extraction is mapPartitions (one task per input split, no shuffle);
  * frame sampling explodes rows but projects the payload away first when
  * only metadata is needed downstream.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      mime: String,
      meta: Map[String, String]
  )

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      embedding: Array[Float]
  )

  final case class FrameSample(
      media_id: Long,
      frame_index: Int,
      frame_ts_ms: Long,
      frame_payload: Array[Byte]
  )

  /** Deterministic fake media table derived from a seed table (the test
    * corpus has no real media; payload bytes are a hash-stretch of the id).
    */
  def syntheticMediaTable(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("media_id"))
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("media_id"), lit(3)) + 1).cast("int")))
      .withColumn("payload", sha2(concat(lit("payload:"), col("media_id")), 512).cast("binary"))
      .withColumn("mime",
        when(col("modality") === "image", "image/png")
          .when(col("modality") === "audio", "audio/wav")
          .otherwise("video/mp4"))
      .withColumn("meta", map(lit("synthetic"), lit("true")))
      .as[MediaRecord]
  }

  // ===== REAL decode (JDK codecs) with deterministic STUB fallback ==========
  // Properties of undecodable payloads derive ONLY from payload bytes ->
  // reproducible everywhere. Swap heavier codecs in by extending decodeImage/
  // decodeAudio; every caller goes through these two entry points.
  private def stubDecodeImage(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 64 + math.abs(h % 193)
    val height = 64 + math.abs((h / 193) % 151)
    (width, height, 3)
  }

  private def stubEmbed(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    var acc = 1125899906842597L
    while (i < dim) {
      val b = payload(i % payload.length)
      acc = acc * 31 + b
      out(i) = ((acc % 1000).toFloat) / 1000.0f
      i += 1
    }
    out
  }

  /** Decode payload with javax.imageio; None if no installed reader claims
    * the byte stream (ImageIO.read sniffs magic bytes, never throws here).
    */
  private[ops] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Grid-pooled grayscale embedding: average luma over a sqrt(dim) x
    * sqrt(dim)-ish grid of cells, normalized to [0,1] — a real, deterministic
    * content feature (the classic "tiny image" baseline descriptor).
    */
  private[ops] def gridLumaEmbedding(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val cols = math.max(1, math.sqrt(dim.toDouble).toInt)
    val rows = math.max(1, dim / cols)
    val out = new Array[Float](dim)
    var cell = 0
    while (cell < rows * cols && cell < dim) {
      val (r, c) = (cell / cols, cell % cols)
      val x0 = c * img.getWidth / cols; val x1 = math.max(x0 + 1, (c + 1) * img.getWidth / cols)
      val y0 = r * img.getHeight / rows; val y1 = math.max(y0 + 1, (r + 1) * img.getHeight / rows)
      var sum = 0.0; var n = 0
      var y = y0
      while (y < y1 && y < img.getHeight) {
        var x = x0
        while (x < x1 && x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000.0
          n += 1; x += 1
        }
        y += 1
      }
      out(cell) = if (n == 0) 0f else (sum / n / 255.0).toFloat
      cell += 1
    }
    out
  }

  private[ops] def decodeImageFeatures(payload: Array[Byte], dim: Int): (Int, Int, Int, Array[Float]) =
    decodeImage(payload) match {
      case Some(img) =>
        (img.getWidth, img.getHeight, img.getColorModel.getNumComponents,
          gridLumaEmbedding(img, dim))
      case None =>
        val (w, h, c) = stubDecodeImage(payload)
        (w, h, c, stubEmbed(payload, dim))
    }

  /** Decode payload with javax.sound.sampled; (durationMs, sampleRate,
    * channels, rms of PCM samples normalized to [0,1]), or None if no
    * installed provider recognizes the stream.
    */
  private[ops] def decodeAudioFeatures(payload: Array[Byte]): Option[(Long, Int, Int, Float)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durationMs =
          if (frames >= 0 && fmt.getFrameRate > 0) (frames * 1000L / fmt.getFrameRate.toLong)
          else -1L
        val bytes = in.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        var sumSq = 0.0; var n = 0
        if (bits == 16) {
          val order =
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN
          val buf = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          while (buf.hasRemaining) { val s = buf.get() / 32768.0; sumSq += s * s; n += 1 }
        } else if (bits == 8) {
          var i = 0
          while (i < bytes.length) { val s = bytes(i) / 128.0; sumSq += s * s; n += 1; i += 1 }
        }
        val rms = if (n == 0) 0f else math.sqrt(sumSq / n).toFloat
        Some((durationMs, fmt.getSampleRate.toInt, fmt.getChannels, rms))
      } finally in.close()
    } catch { case _: Exception => None }
  // ==========================================================================

  /** Image decode + feature extraction: mapPartitions so a real decoder can
    * amortize per-partition init (codec contexts, model weights) exactly
    * where this stub does nothing — the batch shape is the contract.
    */
  def extractImageFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media
      .filter(col("modality") === "image")
      .mapPartitions { it =>
        // per-partition init would go here (decoder handles, model session);
        // ImageIO caches its reader SPI registry per-JVM already
        it.map { m =>
          val (w, h, c, emb) = decodeImageFeatures(m.payload, dim)
          ImageFeatures(m.media_id, w, h, c, emb)
        }
      }
  }

  final case class AudioFeatures(
      media_id: Long,
      duration_ms: Long,
      sample_rate: Int,
      channels: Int,
      rms_level: Float
  )

  /** Audio decode + feature extraction (same mapPartitions contract as
    * images; real javax.sound decode for WAV/AIFF/AU, STUB fallback).
    */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media
      .filter(col("modality") === "audio")
      .mapPartitions { it =>
        it.map { m =>
          decodeAudioFeatures(m.payload) match {
            case Some((dur, rate, ch, rms)) =>
              AudioFeatures(m.media_id, dur, rate, ch, rms)
            case None =>
              val h = java.util.Arrays.hashCode(m.payload)
              AudioFeatures(
                m.media_id,
                duration_ms = 500L + math.abs(h % 30000L),
                sample_rate = Seq(16000, 22050, 44100)(math.abs(h % 3)),
                channels = 1 + math.abs((h / 3) % 2),
                rms_level = (math.abs((h / 7) % 1000).toFloat) / 1000.0f)
          }
        }
      }
  }

  /** Image resize: decodable payloads are REALLY resampled (bilinear
    * Graphics2D scale, re-encoded as PNG, `resized=true` in metadata);
    * undecodable payloads pass through with the target dims recorded in
    * metadata. Plan shape either way: narrow map, no shuffle.
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.modality != "image")
        m
      else decodeImage(m.payload) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          m.copy(payload = bos.toByteArray,
            meta = m.meta ++ Map("target_w" -> w.toString, "target_h" -> h.toString,
              "resized" -> "true"))
        case None =>
          m.copy(meta = m.meta ++ Map("target_w" -> w.toString, "target_h" -> h.toString))
      }
    }
  }

  /** Per-frame GIF delay in ms from the image metadata tree
    * (GraphicControlExtension delayTime is in centiseconds; 0 means
    * "unspecified" — browsers render that at ~100 ms, so do we).
    */
  private def gifDelayMs(reader: javax.imageio.ImageReader, index: Int): Long =
    try {
      val tree = reader.getImageMetadata(index)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = tree.getElementsByTagName("GraphicControlExtension")
      if (nodes.getLength == 0) 100L
      else {
        val cs = nodes.item(0).getAttributes.getNamedItem("delayTime").getNodeValue.toLong
        if (cs <= 0) 100L else cs * 10L
      }
    } catch { case _: Exception => 100L }

  /** REAL multi-frame decode for the one video-ish container the JDK ships
    * a codec for: animated GIF. Returns (accumulated ts ms, frame) per
    * frame, or None when the payload isn't a multi-frame GIF (single
    * images don't count as video; true containers — mp4, webm — need a
    * demuxer the JDK lacks and fall back to the stub).
    */
  private[ops] def decodeVideoFrames(
      payload: Array[Byte]): Option[Vector[(Long, java.awt.image.BufferedImage)]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          if (!reader.getFormatName.equalsIgnoreCase("gif")) return None
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 1) return None
          var ts = 0L
          val out = Vector.newBuilder[(Long, java.awt.image.BufferedImage)]
          var i = 0
          while (i < n) {
            out += ((ts, reader.read(i)))
            ts += gifDelayMs(reader, i)
            i += 1
          }
          Some(out.result())
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Video frame sampling: one row per sampled frame (explode). Animated
    * GIFs decode for REAL (frame images re-encoded as PNG, timestamps from
    * the per-frame delay metadata); payloads without a JDK-readable
    * multi-frame stream keep the deterministic stub (frame count derived
    * from payload bytes).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long = 1000L, maxFrames: Int = 8): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media
      .filter(col("modality") === "video")
      .flatMap { m =>
        decodeVideoFrames(m.payload) match {
          case Some(frames) =>
            // honor the sampling interval like the stub path: keep the
            // first frame at or past each everyMs boundary
            var next = 0L
            val sampled = frames.filter { case (ts, _) =>
              if (ts >= next) { next = ts + everyMs; true } else false
            }
            sampled.take(maxFrames).iterator.zipWithIndex.map { case ((ts, img), i) =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              FrameSample(m.media_id, i, ts, bos.toByteArray)
            }
          case None =>
            val durationMs = 1000L + math.abs(java.util.Arrays.hashCode(m.payload) % 10000L)
            val n = math.min(maxFrames, (durationMs / everyMs).toInt + 1)
            (0 until n).iterator.map { i =>
              val ts = i * everyMs
              // STUB frame payload: tagged slice of source payload
              val fp = (s"frame:$i:" + m.media_id).getBytes("UTF-8")
              FrameSample(m.media_id, i, ts, fp)
            }
        }
      }
  }

  /** Modality-level audit: row counts + payload bytes per modality. */
  def mediaStats(media: Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        avg(length(col("payload"))).as("avg_bytes"))
}
