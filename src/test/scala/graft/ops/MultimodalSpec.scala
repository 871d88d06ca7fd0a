package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMediaTable(
    spark, (0L until 9L).toDF("id"), "id")

  test("synthetic media table: modality by id mod 3, REAL payloads with " +
    "exact pinned byte sizes") {
    val rows = media.collect()
    assert(rows.length == 9)
    assert(rows.count(_.modality == "image") == 3)
    assert(rows.count(_.modality == "audio") == 3)
    assert(rows.count(_.modality == "video") == 3)
    assert(rows.filter(_.modality == "image").forall(_.mime == "image/png"))
    // byte sizes are CLOSED-FORM (what the media_stats oracle relies on)
    assert(rows.filter(_.modality == "image")
      .forall(_.payload.length == Multimodal.ImagePayloadBytes))
    assert(rows.filter(_.modality == "video")
      .forall(_.payload.length == Multimodal.VideoPayloadBytes))
    assert(rows.filter(_.modality == "audio")
      .forall(r => r.payload.length == 44 + 1600 * (1 + (r.media_id % 4).toInt)))
  }

  test("extractImageFeatures: REAL ImageIO decode recovers the generator's " +
    "formula dims; embedding reflects the gradient content") {
    val f1 = Multimodal.extractImageFeatures(media, dim = 8).collect()
    val f2 = Multimodal.extractImageFeatures(media, dim = 8).collect()
    assert(f1.length == 3)
    f1.foreach { f =>
      assert(f.width == 8 + (f.media_id % 17).toInt)
      assert(f.height == 8 + (f.media_id % 13).toInt)
      assert(f.channels == 3)
    }
    assert(f1.forall(_.embedding.length == 8))
    // gray gradient -> luma strictly inside (0,1) for at least one cell
    assert(f1.forall(_.embedding.exists(v => v > 0.0f && v < 1.0f)))
    // deterministic across runs
    assert(f1.sortBy(_.media_id).zip(f2.sortBy(_.media_id)).forall {
      case (a, b) => a.width == b.width && a.embedding.sameElements(b.embedding)
    })
  }

  test("extractAudioFeatures: REAL WAV decode recovers rate/duration and the " +
    "square wave's exact rms") {
    val f = Multimodal.extractAudioFeatures(media).collect()
    assert(f.length == 3)
    f.foreach { a =>
      assert(a.sample_rate == 16000)
      assert(a.channels == 1)
      assert(a.duration_ms == 50L * (1 + (a.media_id % 4)))
      val expectedRms = if ((a.media_id / 3) % 2 == 0) 0.5f else 0.25f
      assert(a.rms_level == expectedRms, s"id=${a.media_id}")
    }
  }

  test("sampleFrames: REAL GIF decode yields the generator's frame count and " +
    "metadata timestamps (2500 ms apart)") {
    val frames = Multimodal.sampleFrames(media, everyMs = 2000L, maxFrames = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet == Set(2L, 5L, 8L))
    byId.foreach { case (id, fs) =>
      assert(fs.length == 2 + ((id / 3) % 3).toInt)
      assert(fs.sortBy(_.frame_index).map(_.frame_ts_ms).toSeq ==
        fs.sortBy(_.frame_index).map(_.frame_index * 2500L).toSeq)
      // frame payloads are real re-encoded PNGs
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fs.head.frame_payload))
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
  }

  test("resizeImages tags only images with target dims") {
    val out = Multimodal.resizeImages(media, 224, 224).collect()
    assert(out.filter(_.modality == "image").forall(_.meta.get("target_w") == Some("224")))
    assert(out.filter(_.modality != "image").forall(!_.meta.contains("target_w")))
  }

  // ---- real-codec paths: genuinely encoded PNG / WAV payloads ------------

  /** 16x8 PNG: left half black, right half white -> known dims + luma. */
  private def pngBytes(w: Int = 16, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 1s mono 16-bit 8kHz WAV of a constant full-scale square wave -> RMS ~1. */
  private def wavBytes(rate: Float = 8000f, seconds: Int = 1): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val n = (rate * seconds).toInt
    val pcm = java.nio.ByteBuffer.allocate(n * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => pcm.putShort(if (i % 2 == 0) 32767 else -32767))
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def realMedia = {
    import Multimodal.MediaRecord
    spark.createDataset(Seq(
      MediaRecord(100L, "image", pngBytes(), "image/png", Map.empty),
      MediaRecord(101L, "audio", wavBytes(), "audio/wav", Map.empty)
    ))
  }

  test("real PNG payloads decode to true dims and content-derived embedding") {
    val f = Multimodal.extractImageFeatures(realMedia, dim = 4).collect()
    assert(f.length == 1)
    assert(f.head.width == 16 && f.head.height == 8 && f.head.channels == 3)
    // 2x2 luma grid: left cells dark (~0), right cells bright (~1)
    val e = f.head.embedding
    assert(e(0) < 0.1f && e(1) > 0.9f && e(2) < 0.1f && e(3) > 0.9f)
  }

  test("real WAV payloads decode to true rate/duration/rms") {
    val f = Multimodal.extractAudioFeatures(realMedia).collect()
    assert(f.length == 1)
    assert(f.head.sample_rate == 8000)
    assert(f.head.channels == 1)
    assert(math.abs(f.head.duration_ms - 1000L) <= 1L)
    assert(f.head.rms_level > 0.99f)
  }

  test("resizeImages really resamples decodable payloads") {
    val out = Multimodal.resizeImages(realMedia, 4, 4).collect()
    val img = out.find(_.modality == "image").get
    assert(img.meta.get("resized") == Some("true"))
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img.payload))
    assert(decoded.getWidth == 4 && decoded.getHeight == 4)
    // the generator's PNGs are decodable -> they really resize too
    val synth = Multimodal.resizeImages(media, 4, 4).collect()
    assert(synth.filter(_.modality == "image").forall(_.meta.get("resized") == Some("true")))
    // an UNDECODABLE payload passes through with only the target recorded
    import Multimodal.MediaRecord
    val junk = spark.createDataset(Seq(
      MediaRecord(300L, "image", Array.fill[Byte](64)(7), "image/png", Map.empty)))
    val passed = Multimodal.resizeImages(junk, 4, 4).collect().head
    assert(!passed.meta.contains("resized") && passed.meta.get("target_w") == Some("4"))
  }

  /** 3-frame animated GIF (4x4, solid red/green/blue) via ImageIO's
    * sequence writer — the JDK's real multi-frame encode path.
    */
  private def animatedGifBytes(nFrames: Int = 3): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
      (0 until nFrames).foreach { i =>
        val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, colors(i % 3))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("sampleFrames really decodes animated GIF frames with metadata timestamps") {
    import Multimodal.MediaRecord
    val gif = spark.createDataset(Seq(
      MediaRecord(200L, "video", animatedGifBytes(3), "image/gif", Map.empty)))
    // everyMs coarser than the GIF's 100ms delays samples only frame 0
    assert(Multimodal.sampleFrames(gif, everyMs = 1000L, maxFrames = 8).count() == 1)
    val frames = Multimodal.sampleFrames(gif, everyMs = 100L, maxFrames = 8)
      .collect().sortBy(_.frame_index)
    assert(frames.length == 3)
    assert(frames.map(_.frame_index).toSeq == Seq(0, 1, 2))
    // unspecified GIF delay renders at the 100ms browser convention
    assert(frames.map(_.frame_ts_ms).toSeq == Seq(0L, 100L, 200L))
    // frame payloads are REAL re-encoded PNGs with the source frame's color
    val decoded = frames.map(f =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame_payload)))
    assert(decoded.forall(img => img.getWidth == 4 && img.getHeight == 4))
    val rgb = decoded.map(_.getRGB(1, 1) & 0xffffff)
    // GIF palettes quantize, so check the dominant channel, not exact values
    assert((rgb(0) >> 16) > 0xc0 && ((rgb(1) >> 8) & 0xff) > 0xc0 && (rgb(2) & 0xff) > 0xc0)
  }

  test("mediaStats aggregates counts and bytes per modality") {
    val stats = Multimodal.mediaStats(media).orderBy("modality").collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.forall(_.getLong(1) == 3L))
    assert(stats.forall(r => r.getLong(2) > 0L))
  }

  test("dhashOf: hand-computed bits on a constructed gradient, identical " +
    "rows replicate per row band, empty right-edge bands give 0 bits") {
    // 16x8 left-dark/right-bright split: columns 0-7 luma 0, 8-15 luma 255
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0 else 0xffffff)
    // 8 column bands of width 2: bands 0-3 dark, 4-7 bright -> with 7
    // comparisons per row, only "brighter than right neighbor" bits are 0
    // (monotone non-decreasing): dhash must be 0
    assert(Multimodal.dhashOf(img, 8, 7) == 0L)
    // flip: left bright -> every band boundary at the split sets one bit
    val img2 = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16)
      img2.setRGB(x, y, if (x < 8) 0xffffff else 0)
    // bands 0-3 bright, 4-7 dark: bit c set iff band c > band c+1 -> only
    // c=3; replicated across 8 row bands at spacing 7
    val expected = (0 until 8).map(r => 1L << (r * 7 + 3)).sum
    assert(Multimodal.dhashOf(img2, 8, 7) == expected)
    // width 4 < 8 bands: right bands empty, comparisons against cnt=0 are
    // false -> a solid tiny image hashes to 0 (deterministic, no NaN/div)
    val tiny = new java.awt.image.BufferedImage(4, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 4) tiny.setRGB(x, y, 0x808080)
    assert(Multimodal.dhashOf(tiny, 8, 7) == 0L)
  }

  test("imageDhash end-to-end: decode path produces the closed-form hash " +
    "of the generator's gradient images") {
    val out = Multimodal.imageDhash(media, rows = 8, cols = 7)
      .collect().map(d => d.media_id -> d.dhash).toMap
    assert(out.keySet == Set(0L, 3L, 6L))
    // replay the generator: w = 8+id%17 columns, luma 1000*((x*7+id)%256)
    def ref(id: Long): Long = {
      val w = (8 + id % 17).toInt
      val s = Array.fill(8)(0L); val n = Array.fill(8)(0L)
      for (x <- 0 until w) {
        val b = x * 8 / w
        s(b) += 1000L * ((x * 7 + id) % 256); n(b) += 1
      }
      val rowbits = (0 until 7)
        .filter(c => s(c) * n(c + 1) > s(c + 1) * n(c))
        .map(c => 1L << c).sum
      (0 until 8).map(r => rowbits << (r * 7)).sum
    }
    assert(out == Map(0L -> ref(0), 3L -> ref(3), 6L -> ref(6)), s"got $out")
  }

  test("mp4 keyframe demux: sync samples come back with exact stts " +
    "timestamps and exact mdat bitstream slices; no stss means every " +
    "sample is sync; truncation falls to the stub") {
    val movie = Multimodal.syntheticMp4Movie()
    val syncs = Multimodal.extractMp4SyncSamples(movie)
    assert(syncs.isDefined, "full movie must demux")
    val s = syncs.get
    // stss = {1,4,7,10} at 100 ms/sample -> 0/300/600/900 ms
    assert(s.map(_._1) == Vector(0L, 300L, 600L, 900L), s.map(_._1))
    // fixture byte (sampleIdx*16 + i) at each slice position; the sync
    // samples span BOTH stsc chunks (6+4 split), so a chunk-walk bug
    // cannot hide
    s.zip(Seq(0, 3, 6, 9)).foreach { case ((_, bytes), sampleIdx) =>
      assert(bytes.length == 16)
      (0 until 16).foreach(i =>
        assert(bytes(i) == (sampleIdx * 16 + i).toByte,
          s"sample $sampleIdx byte $i"))
    }
    // stss absent -> all 10 samples are sync (ISO BMFF default)
    val all = Multimodal.extractMp4SyncSamples(
      Multimodal.syntheticMp4Movie(withStss = false))
    assert(all.get.map(_._1) == (0 until 10).map(_ * 100L).toVector)
    // truncated mid-mdat: sample offsets land past the buffer -> None
    assert(Multimodal.extractMp4SyncSamples(movie.take(60)).isEmpty)
  }

  test("sampleFrames on an mp4 demuxes for real: everyMs sampling over " +
    "sync-sample timestamps, raw bitstream payloads; corrupt mp4 keeps " +
    "the deterministic stub") {
    import spark.implicits._
    val movie = Multimodal.syntheticMp4Movie()
    val media = Seq(
      Multimodal.MediaRecord(500L, "video", movie, "video/mp4", Map.empty),
      Multimodal.MediaRecord(501L, "video", movie.take(60), "video/mp4",
        Map.empty)).toDS()
    val frames = Multimodal.sampleFrames(media, everyMs = 400L, maxFrames = 8)
      .collect().groupBy(_.media_id)
    // sync ts 0/300/600/900 sampled at 400 ms -> keep 0 (next=400),
    // skip 300, keep 600 (next=1000), skip 900
    val real = frames(500L).sortBy(_.frame_index)
    assert(real.map(_.frame_ts_ms).toSeq == Seq(0L, 600L), real.map(_.frame_ts_ms).toSeq)
    assert(real(0).frame_payload(0) == 0.toByte && real(1).frame_payload(0) == 96.toByte,
      "payloads must be the raw sync-sample slices")
    // the truncated payload falls back to the stub's tagged frames
    val stub = frames(501L)
    assert(new String(stub(0).frame_payload, "UTF-8").startsWith("frame:0:"))
  }

  test("container probe: synthetic mp4/webm round-trip every closed-form " +
    "property; junk and truncated payloads emit the unknown row") {
    // mp4 (even id): two tracks at id div 2 odd, codec flips at id div 4
    for (id <- Seq(0L, 2L, 4L, 6L, 8L)) {
      val p = Multimodal.parseMp4(Multimodal.syntheticMp4(id))
      assert(p.isDefined, s"mp4 id=$id must parse")
      val c = p.get
      assert(c.container == "mp4" && c.brand == "isom")
      assert(c.duration_ms == 500L * (1 + id % 8), s"id=$id: $c")
      assert(c.n_tracks == 1 + ((id / 2) % 2).toInt, s"id=$id: $c")
      assert(c.video_codec == (if ((id / 4) % 2 == 0) "avc1" else "hev1"))
      assert((c.audio_codec == "mp4a") == ((id / 2) % 2 == 1), s"id=$id: $c")
      assert(c.payload_bytes == Multimodal.ContainerPayloadBytes)
    }
    // webm (odd id)
    for (id <- Seq(1L, 3L, 5L, 7L, 9L)) {
      val c = Multimodal.parseWebm(Multimodal.syntheticWebm(id)).get
      assert(c.container == "webm" && c.brand == "webm")
      assert(c.duration_ms == 500L * (1 + id % 8), s"id=$id: $c")
      assert(c.n_tracks == 1 + ((id / 2) % 2).toInt, s"id=$id: $c")
      assert(c.video_codec == (if ((id / 4) % 2 == 0) "V_VP9" else "V_VP8"))
      assert((c.audio_codec == "A_OPUS") == ((id / 2) % 2 == 1), s"id=$id: $c")
    }
    // robustness: junk, truncation mid-box, wrong magic -> unknown row,
    // never a throw (an audit must account for every payload)
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRecord(100L, "video", Array[Byte](1, 2, 3), "x", Map()),
      Multimodal.MediaRecord(101L, "video",
        Multimodal.syntheticMp4(0L).take(40), "video/mp4", Map()),
      Multimodal.MediaRecord(102L, "video",
        Multimodal.syntheticWebm(1L).take(20), "video/webm", Map()))
    val probed = Multimodal.containerProbe(junk.toDS())
      .collect().map(c => c.media_id -> c.container).toMap
    assert(probed(100L) == "unknown")
    // truncated mp4 keeps its ftyp but loses moov -> no timescale -> unknown
    assert(probed(101L) == "unknown")
    // truncated webm loses Info/DocType mid-walk -> parser stops -> the
    // header alone may or may not carry DocType; either outcome must be a
    // row, not an exception
    assert(Set("unknown", "webm").contains(probed(102L)))
  }

  test("container fixtures round-trip for arbitrary ids (including " +
    "negatives) and the probe never exceeds the fixture bounds") {
    val rng = new scala.util.Random(6)
    val ids = Seq(-1000L, -7L, -1L) ++ (1 to 21).map(_ => rng.nextLong(100000L))
    ids.foreach { id =>
      val (durMs, two) = Multimodal.containerParams(id)
      val mp4 = Multimodal.parseMp4(Multimodal.syntheticMp4(id)).get
      val webm = Multimodal.parseWebm(Multimodal.syntheticWebm(id)).get
      for (c <- Seq(mp4, webm)) {
        assert(c.duration_ms == durMs, s"id=$id: $c")
        assert(c.n_tracks == (if (two) 2 else 1), s"id=$id: $c")
        assert(c.payload_bytes == Multimodal.ContainerPayloadBytes)
        assert(c.video_codec != null)
        assert((c.audio_codec != null) == two, s"id=$id: $c")
      }
    }
  }
}
