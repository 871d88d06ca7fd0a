package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMediaTable(
    spark, (0L until 9L).toDF("id"), "id")

  test("synthetic media table: modality by id mod 3, non-empty payloads") {
    val rows = media.collect()
    assert(rows.length == 9)
    assert(rows.forall(_.payload.nonEmpty))
    assert(rows.count(_.modality == "image") == 3)
    assert(rows.count(_.modality == "audio") == 3)
    assert(rows.count(_.modality == "video") == 3)
    assert(rows.filter(_.modality == "image").forall(_.mime == "image/png"))
  }

  test("extractImageFeatures: only images, deterministic dims, fixed embedding width") {
    val f1 = Multimodal.extractImageFeatures(media, dim = 8).collect()
    val f2 = Multimodal.extractImageFeatures(media, dim = 8).collect()
    assert(f1.length == 3)
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.channels == 3))
    assert(f1.forall(_.embedding.length == 8))
    // deterministic across runs
    assert(f1.sortBy(_.media_id).zip(f2.sortBy(_.media_id)).forall {
      case (a, b) => a.width == b.width && a.embedding.sameElements(b.embedding)
    })
  }

  test("extractAudioFeatures: only audio rows, deterministic plausible properties") {
    val f = Multimodal.extractAudioFeatures(media).collect()
    assert(f.length == 3)
    assert(f.forall(a => a.duration_ms >= 500L))
    assert(f.forall(a => Seq(16000, 22050, 44100).contains(a.sample_rate)))
    assert(f.forall(a => a.channels == 1 || a.channels == 2))
    assert(f.forall(a => a.rms_level >= 0.0f && a.rms_level <= 1.0f))
  }

  test("sampleFrames: only videos, monotone frame timestamps, bounded count") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L, maxFrames = 3).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.nonEmpty)
    byId.values.foreach { fs =>
      assert(fs.length <= 3)
      assert(fs.sortBy(_.frame_index).map(_.frame_ts_ms).toSeq ==
        fs.sortBy(_.frame_index).map(_.frame_index * 1000L).toSeq)
    }
  }

  test("resizeImages tags only images with target dims") {
    val out = Multimodal.resizeImages(media, 224, 224).collect()
    assert(out.filter(_.modality == "image").forall(_.meta.get("target_w") == Some("224")))
    assert(out.filter(_.modality != "image").forall(!_.meta.contains("target_w")))
  }

  test("mediaStats aggregates counts and bytes per modality") {
    val stats = Multimodal.mediaStats(media).orderBy("modality").collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.forall(_.getLong(1) == 3L))
    assert(stats.forall(r => r.getLong(2) > 0L))
  }
}
