package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration shape,
  * explode-per-frame — is real and tested. The actual media DECODE is a
  * clearly-marked STUB (no image/audio codecs in this environment): a
  * deterministic fake that derives "decoded" properties from the payload
  * bytes, so pipelines exercise realistic row widths and the stub can be
  * swapped for a JNI/codec implementation without touching any plumbing.
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

  // ===== STUB: deterministic fake decode ====================================
  // Replace with a real codec (e.g. javacv / libvips JNI) in production.
  // Properties derive ONLY from payload bytes -> reproducible everywhere.
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
        // per-partition init would go here (decoder handles, model session)
        it.map { m =>
          val (w, h, c) = stubDecodeImage(m.payload)
          ImageFeatures(m.media_id, w, h, c, stubEmbed(m.payload, dim))
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
    * images; STUB probe derives properties from payload bytes).
    */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media
      .filter(col("modality") === "audio")
      .mapPartitions { it =>
        it.map { m =>
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

  /** Resize plumbing: payload passthrough with target dims in metadata (a
    * real impl transforms bytes; the plan shape — narrow map, no shuffle —
    * is identical).
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.modality == "image")
        m.copy(meta = m.meta ++ Map("target_w" -> w.toString, "target_h" -> h.toString))
      else m
    }
  }

  /** Video frame sampling: one row per sampled frame (explode). Frame count
    * derives deterministically from the payload (stub for container probe).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long = 1000L, maxFrames: Int = 8): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media
      .filter(col("modality") === "video")
      .flatMap { m =>
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

  /** Modality-level audit: row counts + payload bytes per modality. */
  def mediaStats(media: Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        avg(length(col("payload"))).as("avg_bytes"))
}
