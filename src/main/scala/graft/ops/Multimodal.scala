package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * Image and audio decode are REAL for the formats the JDK ships codecs for:
  * `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP) and `javax.sound.sampled`
  * (WAV/AIFF/AU PCM) — and the synthetic corpus below emits genuinely
  * decodable PNG/WAV/animated-GIF payloads, so the real codec paths run end
  * to end in every query. Payloads no codec claims fall back to a
  * clearly-marked deterministic STUB that derives "decoded" properties from
  * the payload bytes, so heavier codecs (video containers, EXR, Opus…)
  * swap in without touching any plumbing. Video frame EXTRACTION is real
  * for animated GIF (the JDK's only multi-frame codec, per-frame delay
  * metadata and all); true containers (mp4/webm) need a demuxer the JDK
  * lacks and fall back to the stub.
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

  // ===== synthetic corpus with REAL payload bytes ===========================
  // Every payload is a genuinely decodable file (PNG / canonical WAV /
  // animated GIF) whose DECODED properties derive from the id by a
  // closed-form formula, and whose BYTE LENGTH is pinned exactly (ancillary
  // padding chunks) — so media_stats, media_image_features,
  // media_audio_features and media_frame_sample all have DuckDB-expressible
  // oracles while exercising the real JDK codec paths end to end.

  /** Exact payload size of every image row (PNG padded via tEXt chunk). */
  final val ImagePayloadBytes = 2048
  /** Exact payload size of every video row (GIF padded via comment ext). */
  final val VideoPayloadBytes = 4096
  /** Per-frame GIF delay written by the generator, centiseconds. */
  final val VideoFrameDelayCs = 250

  /** Image dims: width = 8 + id%17, height = 8 + id%13 (the oracle's
    * formula).
    */
  private[ops] def imageDims(id: Long): (Int, Int) =
    (8 + (id % 17).toInt, 8 + (id % 13).toInt)

  /** Audio shape: (nSamples, amplitude). 16 kHz mono 16-bit square wave, so
    * duration_ms = nSamples/16 and rms = amplitude/32768 EXACTLY (both
    * powers of two -> no float rounding on either engine).
    */
  private[ops] def audioParams(id: Long): (Int, Int) =
    (800 * (1 + (id % 4).toInt), if ((id / 3) % 2 == 0L) 16384 else 8192)

  /** Video frame count: 2 + (id/3)%3 in {2,3,4}. */
  private[ops] def videoFrameCount(id: Long): Int = 2 + ((id / 3) % 3).toInt

  /** Pad a PNG to exactly `target` bytes by inserting a tEXt chunk before
    * IEND (ancillary; every decoder skips it).
    */
  private def padPng(png: Array[Byte], target: Int): Array[Byte] = {
    val dataLen = target - png.length - 12
    require(dataLen >= 3, s"PNG of ${png.length} B cannot pad to $target B")
    val data = new Array[Byte](dataLen)
    data(0) = 'p'; data(1) = 'd'; data(2) = 0
    java.util.Arrays.fill(data, 3, dataLen, 'x'.toByte)
    val typ = "tEXt".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(target)
    out.put(png, 0, png.length - 12) // everything up to IEND
    out.putInt(dataLen).put(typ).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.put(png, png.length - 12, 12) // IEND
    out.array()
  }

  /** Pad a GIF to exactly `target` bytes by inserting a comment extension
    * (0x21 0xFE <sub-blocks> 0x00) before the 0x3B trailer.
    */
  private def padGif(gif: Array[Byte], target: Int): Array[Byte] = {
    val need = target - gif.length
    require(need >= 6, s"GIF of ${gif.length} B cannot pad to $target B")
    val out = new java.io.ByteArrayOutputStream(target)
    out.write(gif, 0, gif.length - 1) // everything up to the trailer
    out.write(0x21); out.write(0xfe)
    var rem = need - 3 // header (2) + block terminator (1) already counted
    if (rem % 2 == 1) { out.write(2); out.write('x'); out.write('x'); rem -= 3 }
    while (rem > 0) { out.write(1); out.write('x'); rem -= 2 }
    out.write(0x00)
    out.write(0x3b)
    out.toByteArray
  }

  private[ops] def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = imageDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      // per-column gray gradient (rows identical -> tiny deflate output,
      // so padding to the fixed size always has room)
      while (x < w) {
        val g = ((x * 7 + id) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    padPng(encodePng(img), ImagePayloadBytes)
  }

  private[ops] def syntheticWav(id: Long): Array[Byte] = {
    val (n, amp) = audioParams(id)
    val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    buf.put("RIFF".getBytes(ascii)).putInt(36 + 2 * n).put("WAVE".getBytes(ascii))
    buf.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(16000).putInt(32000) // rate, byte rate
      .putShort(2).putShort(16)    // block align, bits
    buf.put("data".getBytes(ascii)).putInt(2 * n)
    var i = 0
    while (i < n) {
      buf.putShort(if (i % 2 == 0) amp.toShort else (-amp).toShort)
      i += 1
    }
    buf.array()
  }

  private[ops] def syntheticGif(id: Long): Array[Byte] = {
    val nFrames = videoFrameCount(id)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00)
      var i = 0
      while (i < nFrames) {
        val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { img.setRGB(x, y, colors(i)); x += 1 }; y += 1 }
        val meta = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), null)
        val fmtName = meta.getNativeMetadataFormatName
        val root = meta.getAsTree(fmtName).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = {
          val nodes = root.getElementsByTagName("GraphicControlExtension")
          if (nodes.getLength > 0)
            nodes.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val g = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
            root.appendChild(g); g
          }
        }
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", VideoFrameDelayCs.toString)
        meta.setFromTree(fmtName, root)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
        i += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    padGif(bos.toByteArray, VideoPayloadBytes)
  }

  /** Deterministic media table derived from a seed id table. Payloads are
    * REAL files (PNG / WAV / animated GIF — the JDK-codec formats), one
    * modality per id mod 3, generated per partition on the executors:
    * the plumbing AND the decode paths are exercised for real, and every
    * decoded property (dims, duration, rms, frame count/timestamps, byte
    * sizes) follows a closed-form formula of the id.
    */
  def syntheticMediaTable(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val synth = Map("synthetic" -> "true")
        math.floorMod(id, 3L).toInt match {
          case 0 => MediaRecord(id, "image", syntheticPng(id), "image/png", synth)
          case 1 => MediaRecord(id, "audio", syntheticWav(id), "audio/wav", synth)
          case _ => MediaRecord(id, "video", syntheticGif(id), "image/gif", synth)
        }
      }
    }
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

  /** ImageIO's DEFAULT stream wrappers are disk-backed
    * (`FileCacheImage{Input,Output}Stream`): every decode/encode of an
    * in-memory payload would create, write, and delete a temp FILE. At one
    * payload per row that turns a CPU-bound codec pass into local-disk
    * I/O — measured 4x on the frame-sampling query. All codec entry points
    * below use explicit memory-cached streams instead.
    */
  private def memIn(payload: Array[Byte]): javax.imageio.stream.ImageInputStream =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))

  /** PNG-encode via a memory-cached stream (never the temp-file default). */
  private[ops] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    bos.toByteArray
  }

  /** Decode payload with javax.imageio; None if no installed reader claims
    * the byte stream (ImageIO.read sniffs magic bytes, never throws here).
    */
  private[ops] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    // ImageIO.read(ImageInputStream) closes the stream itself — an extra
    // close() here would throw and masquerade as an undecodable payload
    try Option(javax.imageio.ImageIO.read(memIn(payload)))
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
          m.copy(payload = encodePng(out),
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
      val iis = memIn(payload)
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
              FrameSample(m.media_id, i, ts, encodePng(img))
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

  final case class ImageDhash(media_id: Long, dhash: Long)

  /** Perceptual difference-hash (dHash) over REAL decoded pixels: the
    * image is area-averaged onto a `rows`×(`cols`+1) luma grid and bit
    * (r, c) of the 64-bit hash is set when cell (r, c) is brighter than
    * its right neighbor (r, c+1) — the standard resize-robust near-dup
    * fingerprint for image corpora.
    *
    * Exactness: luma is integer `299·R + 587·G + 114·B` per pixel, cell
    * brightness compares by cross-multiplied integer sums
    * (`sumA·cntB > sumB·cntA`, never a float average), and grid bands are
    * the floor map `x → x·(cols+1) div w` — so the hash of a given image
    * is bit-identical on any engine/JVM. Images narrower than cols+1
    * leave right-edge bands empty (cnt 0): the comparison is then
    * `sumA·0 > 0·cntA` = false, deterministic on both sides.
    *
    * Scale shape: same per-partition mapPartitions codec contract as
    * [[extractImageFeatures]]; the hash is 8 bytes per image — grouping
    * or banded Hamming joins downstream never touch pixels.
    */
  def imageDhash(media: Dataset[MediaRecord], rows: Int = 8, cols: Int = 8): Dataset[ImageDhash] = {
    require(rows >= 1 && cols >= 1 && rows * cols <= 64,
      s"rows*cols must fit 64 bits, got $rows x $cols")
    import media.sparkSession.implicits._
    media
      .filter(col("modality") === "image")
      .mapPartitions { it =>
        it.flatMap { m =>
          decodeImage(m.payload).map(img => ImageDhash(m.media_id, dhashOf(img, rows, cols)))
        }
      }
  }

  private[ops] def dhashOf(img: java.awt.image.BufferedImage, rows: Int, cols: Int): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val bandsX = cols + 1
    val sums = Array.ofDim[Long](rows, bandsX)
    val cnts = Array.ofDim[Long](rows, bandsX)
    var y = 0
    while (y < h) {
      val r = y * rows / h
      var x = 0
      while (x < w) {
        val bx = x * bandsX / w
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        sums(r)(bx) += luma
        cnts(r)(bx) += 1L
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        if (sums(r)(c) * cnts(r)(c + 1) > sums(r)(c + 1) * cnts(r)(c))
          hash |= 1L << (r * cols + c)
        c += 1
      }
      r += 1
    }
    hash
  }
}
