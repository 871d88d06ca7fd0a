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

  /** REAL mp4 KEYFRAME DEMUX — pure byte algebra over the ISO BMFF sample
    * tables, no codec dependency: walks the video trak's `mdhd` (track
    * timescale), `stts` (per-sample decode times), `stss` (sync-sample
    * numbers; absent ⇒ every sample is sync, per spec), `stsz` (sample
    * sizes), and `stsc`+`stco` (sample→chunk→file-offset mapping), and
    * returns each SYNC sample's (timestamp ms, raw bitstream bytes) —
    * exactly what a downstream GPU decode stage consumes (AVCC/AnnexB
    * access units). Pixel DECODE of those samples stays formally
    * de-scoped (README capability matrix): it needs an H.264/VP9 codec
    * the JVM does not ship. Any truncation/corruption returns None (the
    * stub fallback), never throws. 32-bit box sizes and stco only (the
    * [[parseMp4]] convention; co64/largebox payloads fall to the stub).
    */
  private[ops] def extractMp4SyncSamples(
      p: Array[Byte]): Option[Vector[(Long, Array[Byte])]] =
    try {
      def u32(off: Int): Long =
        ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
          ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
      def fourcc(off: Int): String = new String(p, off, 4, "US-ASCII")
      if (p.length < 16 || fourcc(4) != "ftyp") return None
      // locate the VIDEO trak's stbl boxes + its mdhd timescale
      var timescale = 0L
      var stts: Array[Long] = null // flattened per-sample deltas
      var stss: Array[Int] = null // 1-based sync sample numbers
      var stsz: Array[Int] = null
      var stsc: Array[(Int, Int)] = null // (first_chunk, samples_per_chunk)
      var stco: Array[Long] = null
      var inVideoTrak = false
      // mdhd precedes hdlr inside mdia, so the track timescale is parked
      // here until hdlr reveals whether this trak is the video one
      var pendingMdhd = 0L
      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val size = u32(off)
          val typ = fourcc(off + 4)
          if (size < 8 || off + size > to) return
          typ match {
            case "trak" =>
              inVideoTrak = false // hdlr inside decides
              pendingMdhd = 0L
              walk(off + 8, off + size.toInt)
            case t if containers(t) => walk(off + 8, off + size.toInt)
            case "hdlr" if off + 20 <= to =>
              inVideoTrak = fourcc(off + 16) == "vide"
              if (inVideoTrak && pendingMdhd > 0L) timescale = pendingMdhd
            case "mdhd" if off + 8 < to && p(off + 8) == 0 &&
                off + 32 <= to =>
              pendingMdhd = u32(off + 20)
            case "stts" if inVideoTrak && off + 16 <= to =>
              val n = u32(off + 12).toInt
              if (off + 16 + 8L * n <= to) {
                val deltas = Array.newBuilder[Long]
                var i = 0
                while (i < n) {
                  val cnt = u32(off + 16 + 8 * i).toInt
                  val d = u32(off + 20 + 8 * i)
                  var j = 0
                  while (j < cnt) { deltas += d; j += 1 }
                  i += 1
                }
                stts = deltas.result()
              }
            case "stss" if inVideoTrak && off + 16 <= to =>
              val n = u32(off + 12).toInt
              if (off + 16 + 4L * n <= to)
                stss = Array.tabulate(n)(i => u32(off + 16 + 4 * i).toInt)
            case "stsz" if inVideoTrak && off + 20 <= to =>
              val fixed = u32(off + 12)
              val n = u32(off + 16).toInt
              if (fixed != 0) stsz = Array.fill(n)(fixed.toInt)
              else if (off + 20 + 4L * n <= to)
                stsz = Array.tabulate(n)(i => u32(off + 20 + 4 * i).toInt)
            case "stsc" if inVideoTrak && off + 16 <= to =>
              val n = u32(off + 12).toInt
              if (off + 16 + 12L * n <= to)
                stsc = Array.tabulate(n)(i =>
                  (u32(off + 16 + 12 * i).toInt, u32(off + 20 + 12 * i).toInt))
            case "stco" if inVideoTrak && off + 16 <= to =>
              val n = u32(off + 12).toInt
              if (off + 16 + 4L * n <= to)
                stco = Array.tabulate(n)(i => u32(off + 16 + 4 * i))
            case _ => ()
          }
          off += size.toInt
        }
      }
      walk(0, p.length)
      if (timescale <= 0L || stts == null || stsz == null ||
        stsc == null || stco == null) return None
      val nSamples = math.min(stts.length, stsz.length)
      if (nSamples == 0) return None
      // per-sample file offsets via the chunk map
      val offsets = new Array[Long](nSamples)
      var sample = 0
      var run = 0
      while (sample < nSamples && run < stsc.length) {
        val (firstChunk, perChunk) = stsc(run)
        val lastChunk =
          if (run + 1 < stsc.length) stsc(run + 1)._1 - 1 else stco.length
        var chunk = firstChunk
        while (chunk <= lastChunk && sample < nSamples) {
          if (chunk < 1 || chunk > stco.length) return None
          var base = stco(chunk - 1)
          var s = 0
          while (s < perChunk && sample < nSamples) {
            offsets(sample) = base
            base += stsz(sample)
            sample += 1
            s += 1
          }
          chunk += 1
        }
        run += 1
      }
      if (sample < nSamples) return None
      val dts = stts.scanLeft(0L)(_ + _) // dts(i) = start time of sample i
      val syncIdx: Array[Int] =
        if (stss != null) stss.map(_ - 1).filter(i => i >= 0 && i < nSamples)
        else Array.tabulate(nSamples)(identity)
      val out = Vector.newBuilder[(Long, Array[Byte])]
      syncIdx.foreach { i =>
        val o = offsets(i)
        val sz = stsz(i)
        if (o < 0 || o + sz > p.length) return None
        out += ((dts(i) * 1000L / timescale,
          java.util.Arrays.copyOfRange(p, o.toInt, o.toInt + sz)))
      }
      val r = out.result()
      if (r.isEmpty) None else Some(r)
    } catch { case _: Exception => None }

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
    * the per-frame delay metadata); mp4 payloads DEMUX for real — each
    * emitted frame is a sync sample's raw codec bitstream with its exact
    * stts timestamp ([[extractMp4SyncSamples]]; pixel decode of those
    * samples is the documented de-scope). Payloads that are neither keep
    * the deterministic stub (frame count derived from payload bytes).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long = 1000L, maxFrames: Int = 8): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    // keep the first frame at or past each everyMs boundary (shared by
    // the GIF and mp4 real paths)
    def sampleEvery[A](frames: Vector[(Long, A)]): Vector[(Long, A)] = {
      var next = 0L
      frames.filter { case (ts, _) =>
        if (ts >= next) { next = ts + everyMs; true } else false
      }
    }
    media
      .filter(col("modality") === "video")
      .flatMap { m =>
        decodeVideoFrames(m.payload) match {
          case Some(frames) =>
            sampleEvery(frames).take(maxFrames).iterator.zipWithIndex
              .map { case ((ts, img), i) =>
                FrameSample(m.media_id, i, ts, encodePng(img))
              }
          case None => extractMp4SyncSamples(m.payload) match {
            case Some(syncs) =>
              sampleEvery(syncs).take(maxFrames).iterator.zipWithIndex
                .map { case ((ts, bytes), i) =>
                  FrameSample(m.media_id, i, ts, bytes)
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

  // ===== container PROBE (mp4 / webm): header parse, no decode =============
  // True container DECODE still needs an external demuxer (the documented
  // stub fallback), but the container METADATA — brand/doctype, movie
  // duration, track count, codec ids — is pure byte algebra over the box
  // tree (ISO BMFF) / element tree (EBML). That makes `media_stats`-class
  // audits meaningful for video payloads without any codec dependency.

  final case class ContainerInfo(
      media_id: Long,
      container: String, // mp4 | webm | unknown
      brand: String, // ftyp major brand / EBML DocType
      duration_ms: Long,
      n_tracks: Int,
      video_codec: String, // fourcc / CodecID, null when absent
      audio_codec: String,
      payload_bytes: Int
  )

  /** Walk an ISO BMFF (mp4) box tree: top-level `ftyp` major brand and,
    * under `moov`, the `mvhd` timescale/duration plus each `trak`'s
    * `hdlr` handler and first `stsd` sample-entry fourcc. 32-bit box
    * sizes only (64-bit `size==1` largebox aborts to the unknown row —
    * our audit corpus pins sizes far below 4 GiB).
    */
  private[ops] def parseMp4(p: Array[Byte]): Option[ContainerInfo] = {
    def u32(off: Int): Long =
      ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
        ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
    def fourcc(off: Int): String =
      new String(p, off, 4, "US-ASCII")
    if (p.length < 16 || fourcc(4) != "ftyp") return None
    val brand = fourcc(8)
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var videoCodec: String = null
    var audioCodec: String = null
    // containers whose children are themselves boxes (the walk descends)
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val size = u32(off)
        val typ = fourcc(off + 4)
        if (size < 8 || off + size > to) return // largebox/corrupt: stop
        typ match {
          case "mvhd" =>
            // version(1) flags(3) ctime(4) mtime(4) timescale(4) dur(4)
            // bounds FIRST: a size-8 mvhd abutting the buffer end must
            // fall through to the unknown row, not index past it
            if (off + 28 <= to && p(off + 8) == 0) {
              timescale = u32(off + 20)
              duration = u32(off + 24)
            }
          case "hdlr" =>
            // version/flags(4) predefined(4) handler(4)
            if (off + 24 <= to) {
              nTracks += 1
            }
          case "stsd" =>
            // version/flags(4) entry_count(4) then sample entries (boxes)
            if (off + 24 <= to) {
              val cc = fourcc(off + 20)
              // handler order pins which slot this entry fills: the trak's
              // hdlr box precedes minf/stbl in our generator (and in every
              // conformant muxer), so nTracks already counts this track
              val isAudio = cc == "mp4a" || cc == "opus" || cc == "ac-3"
              if (isAudio) { if (audioCodec == null) audioCodec = cc }
              else if (videoCodec == null) videoCodec = cc
            }
          case t if containers(t) =>
            walk(off + 8, off + size.toInt)
          case _ => ()
        }
        off += size.toInt
      }
    }
    walk(0, p.length)
    if (timescale <= 0L) None
    else Some(ContainerInfo(-1L, "mp4", brand,
      duration * 1000L / timescale, nTracks, videoCodec, audioCodec,
      p.length))
  }

  /** Walk an EBML (webm/Matroska) element tree: DocType from the EBML
    * header; TimecodeScale + Duration from Segment▸Info; TrackType +
    * CodecID from each Segment▸Tracks▸TrackEntry. Handles the 1–8-byte
    * EBML varints for both ids (marker kept) and sizes (marker stripped);
    * an unknown-size element (all-ones varint) aborts to the unknown row.
    */
  private[ops] def parseWebm(p: Array[Byte]): Option[ContainerInfo] = {
    // varint: leading zero bits of the first byte give the width
    def vintWidth(b: Int): Int = {
      var mask = 0x80
      var w = 1
      while (w <= 8 && (b & mask) == 0) { mask >>= 1; w += 1 }
      w
    }
    // element ID keeps its marker bit (matches the spec's id constants)
    def readId(off: Int): (Long, Int) = {
      val w = vintWidth(p(off) & 0xff)
      var v = 0L
      var i = 0
      while (i < w) { v = (v << 8) | (p(off + i) & 0xffL); i += 1 }
      (v, w)
    }
    // size strips the marker bit; all-ones payload = unknown size
    def readSize(off: Int): (Long, Int) = {
      val w = vintWidth(p(off) & 0xff)
      var v = (p(off) & 0xffL) & ((0x80 >> (w - 1)) - 1)
      var i = 1
      while (i < w) { v = (v << 8) | (p(off + i) & 0xffL); i += 1 }
      (v, w)
    }
    def readUint(off: Int, len: Int): Long = {
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (p(off + i) & 0xffL); i += 1 }
      v
    }
    def readFloat(off: Int, len: Int): Double =
      if (len == 4) java.lang.Float.intBitsToFloat(readUint(off, 4).toInt).toDouble
      else if (len == 8) java.lang.Double.longBitsToDouble(readUint(off, 8))
      else 0.0 // EBML floats are 4 or 8 bytes; anything else is corrupt
    if (p.length < 4 || readUint(0, 4) != 0x1a45dfa3L) return None
    var docType: String = null
    var timecodeScale = 1000000L // ns per tick, the spec default
    var durationTicks = 0.0
    var nTracks = 0
    var videoCodec: String = null
    var audioCodec: String = null
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var off = from
      while (off < to) {
        // every truncation class aborts to the unknown row, never throws:
        // a 0x00 lead byte makes vintWidth exceed 8 (invalid varint), and
        // readId/readSize read up to 8 bytes past the lead — bound BOTH
        // before dereferencing (corrupt/truncated crawl payloads are the
        // norm, and one bad byte must not fail the whole partition)
        val iw0 = vintWidth(p(off) & 0xff)
        if (iw0 > 8 || off + iw0 >= to) return // id truncated / no size byte
        val sw0 = vintWidth(p(off + iw0) & 0xff)
        if (sw0 > 8 || off + iw0 + sw0 > to) return // size field truncated
        val (id, iw) = readId(off)
        val (sz, sw) = readSize(off + iw)
        val body = off + iw + sw
        if (sz < 0 || body + sz > to) return
        id match {
          case 0x1a45dfa3L | 0x18538067L | 0x1549a966L | 0x1654ae6bL =>
            walk(body, body + sz.toInt, depth + 1) // header/segment/info/tracks
          case 0xaeL => // TrackEntry
            nTracks += 1
            walk(body, body + sz.toInt, depth + 1)
          case 0x4282L => docType = new String(p, body, sz.toInt, "US-ASCII")
          case 0x2ad7b1L => timecodeScale = readUint(body, sz.toInt)
          case 0x4489L => durationTicks = readFloat(body, sz.toInt)
          case 0x86L =>
            val cc = new String(p, body, sz.toInt, "US-ASCII")
            if (cc.startsWith("A_")) { if (audioCodec == null) audioCodec = cc }
            else if (videoCodec == null) videoCodec = cc
          case _ => () // Void, CRC, unmodeled elements: skip
        }
        off = body + sz.toInt
      }
    }
    walk(0, p.length, 0)
    if (docType == null) None
    else Some(ContainerInfo(-1L, "webm", docType,
      math.round(durationTicks * (timecodeScale / 1000000.0)), nTracks,
      videoCodec, audioCodec, p.length))
  }

  /** Container metadata probe over binary payloads — mp4 (ftyp magic at
    * offset 4) and webm (EBML magic at offset 0); anything else emits the
    * `unknown` row rather than dropping (an audit must account for every
    * payload). Same mapPartitions batch contract as the decode paths; the
    * output carries ~60 bytes per payload, so everything downstream of
    * the probe shuffles metadata, never container bytes.
    */
  def containerProbe(media: Dataset[MediaRecord]): Dataset[ContainerInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        // catch-all on top of the parsers' own bounds checks: the probe's
        // contract is "every payload yields a row" — one corrupt byte
        // sequence must degrade to `unknown`, never fail the partition
        val parsed = scala.util.Try {
          if (m.payload.length >= 8 &&
            new String(m.payload, 4, 4, "US-ASCII") == "ftyp")
            parseMp4(m.payload)
          else if (m.payload.length >= 4 && (m.payload(0) & 0xff) == 0x1a)
            parseWebm(m.payload)
          else None
        }.toOption.flatten
        parsed
          .map(_.copy(media_id = m.media_id))
          .getOrElse(ContainerInfo(m.media_id, "unknown", null, 0L, 0,
            null, null, m.payload.length))
      }
    }
  }

  /** Corpus media profile: modality × concrete format × codec audit, the
    * per-type accounting a 100 TB multimodal curation run starts from.
    * The container probe's output enriches the profile — an mp4/webm
    * payload reports its real brand-derived format and fourcc/CodecID
    * instead of counting as `unknown`; payloads the probe cannot parse
    * (PNG/WAV/GIF or junk) fall back to the record's declared mime with
    * null codecs, so every payload lands in exactly one profile row.
    *
    * Scale shape: the metadata plane (`media_id`, `modality`, `mime`) and
    * the probe plane (~60 B of parsed header facts per payload) are both
    * projected BEFORE the join, so the equi-join on `media_id` and the
    * following groupBy shuffle metadata only — payload bytes never leave
    * their input partition (the [[containerProbe]] contract).
    */
  def mediaProfile(media: Dataset[MediaRecord]): DataFrame = {
    val meta = media.toDF().select(col("media_id"), col("modality"), col("mime"))
    val probe = containerProbe(media).toDF()
      .select(col("media_id"), col("container"), col("video_codec"),
        col("audio_codec"), col("duration_ms"), col("payload_bytes"))
    meta.join(probe, Seq("media_id"))
      .select(col("modality"),
        when(col("container") =!= "unknown", col("container"))
          .otherwise(col("mime")).as("format"),
        col("video_codec"), col("audio_codec"),
        col("duration_ms"), col("payload_bytes"))
      .groupBy("modality", "format", "video_codec", "audio_codec")
      .agg(count(lit(1)).as("n"),
        sum(col("payload_bytes").cast("long")).as("total_bytes"),
        sum(col("duration_ms")).as("total_duration_ms"))
  }

  // ===== synthetic mp4 / webm fixtures (closed-form properties) ============
  /** Exact payload size of every synthetic container (free/Void padded). */
  final val ContainerPayloadBytes = 1024

  /** duration_ms = 500·(1 + id%8); two tracks when (id div 2) is odd. */
  private[ops] def containerParams(id: Long): (Long, Boolean) =
    (500L * (1L + math.floorMod(id, 8L)), math.floorMod(id / 2, 2L) == 1L)

  /** Synthetic mp4: ftyp(isom) + moov{mvhd(timescale 1000), video trak
    * [avc1|hev1 by (id div 4)%2], optional audio trak (mp4a)} + free
    * padding to exactly [[ContainerPayloadBytes]].
    */
  private[ops] def syntheticMp4(id: Long): Array[Byte] = {
    val (durMs, twoTracks) = containerParams(id)
    val vCodec = if (math.floorMod(id / 4, 2L) == 0L) "avc1" else "hev1"
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    def concat(bs: Array[Byte]*): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(bs.map(_.length).sum)
      bs.foreach(out.put)
      out.array()
    }
    val ftyp = box("ftyp", concat("isom".getBytes("US-ASCII"),
      java.nio.ByteBuffer.allocate(4).putInt(0x200).array(),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII")))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // ctime, mtime
      b.putInt(1000) // timescale: ms ticks -> duration IS duration_ms
      b.putInt(durMs.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort)
      b.putInt(0).putInt(0) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt) // unity matrix
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(if (twoTracks) 3 else 2) // next_track_ID
      box("mvhd", b.array())
    }
    def trak(handler: String, codec: String): Array[Byte] = {
      val hdlr = {
        val b = java.nio.ByteBuffer.allocate(25)
        b.putInt(0).putInt(0).put(handler.getBytes("US-ASCII"))
        b.putInt(0).putInt(0).putInt(0).put(0.toByte) // reserved + name ""
        box("hdlr", b.array())
      }
      val stsd = {
        val entry = box(codec, new Array[Byte](8)) // opaque sample entry
        val b = java.nio.ByteBuffer.allocate(8 + entry.length)
        b.putInt(0).putInt(1).put(entry) // version/flags, entry_count
        box("stsd", b.array())
      }
      box("trak", box("mdia", concat(hdlr, box("minf", box("stbl", stsd)))))
    }
    val traks =
      if (twoTracks) concat(trak("vide", vCodec), trak("soun", "mp4a"))
      else trak("vide", vCodec)
    val moov = box("moov", concat(mvhd, traks))
    val sofar = ftyp.length + moov.length
    val pad = ContainerPayloadBytes - sofar
    require(pad >= 8, s"mp4 of $sofar B cannot pad to $ContainerPayloadBytes B")
    concat(ftyp, moov, box("free", new Array[Byte](pad - 8)))
  }

  /** Synthetic mp4 MOVIE with a full sample table — the
    * [[extractMp4SyncSamples]] fixture: 10 fixed-size samples (16 B each,
    * byte (s·16+i) at sample s offset i — every extracted slice is
    * byte-checkable), 100 ms apart (mdhd timescale 1000, one stts run),
    * split 6+4 across two chunks (a real stsc/stco walk, not one chunk),
    * sync samples {1,4,7,10} via stss (or NO stss when `withStss` is
    * false — the spec's "every sample is sync" default). mdat precedes
    * moov so chunk offsets are position-independent of the moov size.
    */
  private[ops] def syntheticMp4Movie(withStss: Boolean = true): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    def concat(bs: Array[Byte]*): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(bs.map(_.length).sum)
      bs.foreach(out.put)
      out.array()
    }
    def full(ints: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * ints.length)
      ints.foreach(b.putInt)
      b.array()
    }
    val nSamples = 10
    val sampleSize = 16
    val mdatPayload = Array.tabulate(nSamples * sampleSize)(i =>
      ((i / sampleSize) * 16 + (i % sampleSize)).toByte)
    val ftyp = box("ftyp", concat("isom".getBytes("US-ASCII"),
      full(0x200), "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII")))
    val mdat = box("mdat", mdatPayload)
    val mdatBase = ftyp.length + 8
    val mvhd = box("mvhd", full(0, 0, 0, 1000, 1000, 0x00010000, 0, 0,
      0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000,
      0, 0, 0, 0, 0, 0, 2))
    val mdhd = box("mdhd", full(0, 0, 0, 1000, 1000, 0))
    val hdlr = box("hdlr", concat(full(0, 0),
      "vide".getBytes("US-ASCII"), full(0, 0, 0), Array(0.toByte)))
    val stsd = box("stsd", concat(full(0, 1), box("avc1", new Array[Byte](8))))
    val stts = box("stts", full(0, 1, nSamples, 100)) // 10 samples, 100 ticks
    val stss = box("stss", full(0, 4, 1, 4, 7, 10))
    val stsz = box("stsz", full(0, sampleSize, nSamples)) // fixed-size form
    val stsc = box("stsc", full(0, 2, 1, 6, 1, 2, 4, 1)) // 6 then 4 per chunk
    val stco = box("stco", full(0, 2, mdatBase, mdatBase + 6 * sampleSize))
    val stbl = box("stbl", concat(
      (Seq(stsd, stts) ++ (if (withStss) Seq(stss) else Nil) ++
        Seq(stsz, stsc, stco)): _*))
    val trak = box("trak", box("mdia", concat(mdhd, hdlr, box("minf", stbl))))
    concat(ftyp, mdat, box("moov", concat(mvhd, trak)))
  }

  /** Synthetic webm: EBML header (DocType "webm") + Segment{Info
    * [TimecodeScale 1 ms, Duration float64 ticks], Tracks [video
    * V_VP9|V_VP8 by (id div 4)%2, optional audio A_OPUS]} + Void padding
    * to exactly [[ContainerPayloadBytes]].
    */
  private[ops] def syntheticWebm(id: Long): Array[Byte] = {
    val (durMs, twoTracks) = containerParams(id)
    val vCodec = if (math.floorMod(id / 4, 2L) == 0L) "V_VP9" else "V_VP8"
    def vsize(n: Int): Array[Byte] = {
      // 2-byte size varint (0x4000 | n): covers every element here
      require(n < 0x4000, s"element of $n B needs a wider size varint")
      Array(((n >> 8) | 0x40).toByte, (n & 0xff).toByte)
    }
    def idBytes(id0: Long): Array[Byte] = {
      val w = if (id0 <= 0xffL) 1 else if (id0 <= 0xffffL) 2
        else if (id0 <= 0xffffffL) 3 else 4
      (0 until w).map(i => ((id0 >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
    }
    def el(id0: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id0) ++ vsize(payload.length) ++ payload
    def uint(v: Long, len: Int): Array[Byte] =
      (0 until len).map(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte).toArray
    val header = el(0x1a45dfa3L, el(0x4282L, "webm".getBytes("US-ASCII")))
    val info = el(0x1549a966L,
      el(0x2ad7b1L, uint(1000000L, 3)) ++ // 1 ms per tick
        el(0x4489L, uint(java.lang.Double.doubleToLongBits(durMs.toDouble), 8)))
    def trackEntry(typ: Int, codec: String): Array[Byte] =
      el(0xaeL, el(0x83L, uint(typ.toLong, 1)) ++
        el(0x86L, codec.getBytes("US-ASCII")))
    val tracks = el(0x1654ae6bL,
      if (twoTracks) trackEntry(1, vCodec) ++ trackEntry(2, "A_OPUS")
      else trackEntry(1, vCodec))
    val segBodyNoPad = info ++ tracks
    // Void: 1-byte id 0xEC + 2-byte size + body, inside the Segment
    val segTarget = ContainerPayloadBytes - header.length - 4 - 2 // seg id+size
    val padBody = segTarget - segBodyNoPad.length - 3
    require(padBody >= 0, s"webm cannot pad to $ContainerPayloadBytes B")
    val voidEl = Array(0xec.toByte) ++ vsize(padBody) ++ new Array[Byte](padBody)
    val segBody = segBodyNoPad ++ voidEl
    header ++ idBytes(0x18538067L) ++ vsize(segBody.length) ++ segBody
  }

  /** Container audit corpus: one mp4 (even ids) / webm (odd ids) payload
    * per input id, every probed property a closed-form formula of the id
    * — the [[syntheticMediaTable]] discipline for the container plane.
    */
  def syntheticContainerTable(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val synth = Map("synthetic" -> "true")
        if (math.floorMod(id, 2L) == 0L)
          MediaRecord(id, "video", syntheticMp4(id), "video/mp4", synth)
        else
          MediaRecord(id, "video", syntheticWebm(id), "video/webm", synth)
      }
    }
  }
}
