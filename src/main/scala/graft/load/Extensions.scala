package graft.load

import graft.core.FileMetadata
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extension points (reference ts_extensions.py:14-75 + registry
  * load_file.py:2362-2418). These are whole-DataFrame strategy hooks, not
  * Catalyst expressions — per the survey (§2.11) nothing in the reference
  * needs a custom Catalyst node; hooks stay declarative so Catalyst still
  * optimizes through them.
  */
trait DataTransformer extends Serializable {
  def transform(df: DataFrame, timestampColumn: Option[String], meta: FileMetadata): DataFrame
}

/** Default transform (reference ts_extensions.py:32-49 / P4): every
  * non-timestamp column numeric-coerced (cast-to-double = pd.to_numeric
  * errors="coerce": garbage -> null), then per-file constant metadata columns
  * appended as literals (explicit per-file lit beats input_file_name() for
  * error attribution; survey §7.4 #9).
  */
class DefaultDataTransformer extends DataTransformer {
  override def transform(
      df: DataFrame,
      timestampColumn: Option[String],
      meta: FileMetadata
  ): DataFrame = {
    // try_cast, not cast: ANSI mode (Spark 4 default) makes plain cast THROW
    // on malformed input; to_numeric(errors="coerce") semantics require null
    val coerced = df.columns.foldLeft(df) { (acc, c) =>
      if (timestampColumn.contains(c)) acc
      else acc.withColumn(c, col(c).try_cast("double"))
    }
    coerced
      .withColumn("source_file", lit(new java.io.File(meta.filepath).getName))
      .withColumn("file_start_time", lit(meta.startTime.orNull))
      .withColumn("file_end_time", lit(meta.endTime.orNull))
  }
}

/** Post-concat hook chain (reference ts_extensions.py:52-75; invocation
  * loop load_file.py:1853-1861 — hook failures are caught and logged, the
  * pipeline continues with the pre-hook frame).
  */
trait PostProcessingHook extends Serializable {
  def process(df: DataFrame, context: scala.collection.mutable.Map[String, Any]): DataFrame
}

/** Z-score outlier removal (reference ts_extensions.py:165-210 / P6):
  * two-pass — one distributed agg for (mean, stddev) per configured column,
  * then a codegen'd filter. pandas std is SAMPLE std (ddof=1) =
  * stddev_samp.
  */
class OutlierRemovalHook(columns: Seq[String], threshold: Double = 3.0)
    extends PostProcessingHook {
  override def process(
      df: DataFrame,
      context: scala.collection.mutable.Map[String, Any]
  ): DataFrame = {
    val present = columns.filter(df.columns.contains)
    if (present.isEmpty) return df
    val statsRow = df
      .agg(
        present.flatMap(c => Seq(avg(col(c)).as(s"mean_$c"), stddev_samp(col(c)).as(s"std_$c")))
          .head,
        present.flatMap(c => Seq(avg(col(c)).as(s"mean_$c"), stddev_samp(col(c)).as(s"std_$c")))
          .tail: _*
      )
      .head()
    present.foldLeft(df) { (acc, c) =>
      val mean = statsRow.getAs[Double](s"mean_$c")
      val std = statsRow.getAs[Any](s"std_$c")
      std match {
        case s: java.lang.Double if s != 0.0 && !s.isNaN =>
          val before = context // removal counts tracked by caller if needed
          val _ = before
          acc.filter(col(c).isNull || abs((col(c) - mean) / s.doubleValue()) <= threshold)
        case _ => acc
      }
    }
  }
}

/** Per-file timestamp normalization example hook analogue (reference
  * ts_extensions.py:128-161): parse a string column to timestamp with a
  * strict format.
  */
class TimestampNormalizer(column: String, format: String) extends DataTransformer {
  override def transform(
      df: DataFrame,
      timestampColumn: Option[String],
      meta: FileMetadata
  ): DataFrame =
    if (df.columns.contains(column))
      df.withColumn(column, to_timestamp(col(column), format))
    else df
}
