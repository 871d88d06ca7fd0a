package graft.ts

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Null-fill operators over an ordered time axis (W4/W5 in the survey;
  * reference load_file.py:2341-2351).
  *
  * Pandas `fillna(method=..., limit=n)` fills at most n consecutive nulls
  * counted from the last valid value — implemented here with an anchor trick:
  * the running `max` of row_number-at-non-null rows marks the last valid row,
  * and distance from that anchor bounds the fill.
  *
  * Scale design: everything is window algebra over one (partitionBy(keys)
  * orderBy ts) sort — a single shuffle shared by all fill columns, no UDFs.
  */
object Fill {

  private def baseWindow(seriesCols: Seq[String], tsCol: String, desc: Boolean): WindowSpec = {
    val w =
      if (seriesCols.nonEmpty) Window.partitionBy(seriesCols.map(col): _*)
      else Window.partitionBy()
    if (desc) w.orderBy(col(tsCol).desc) else w.orderBy(col(tsCol).asc)
  }

  /** Forward-fill `valueCols` (reference fillna(method="ffill", limit=n)). */
  def ffill(
      df: DataFrame,
      tsCol: String,
      valueCols: Seq[String],
      limit: Option[Int] = None,
      seriesCols: Seq[String] = Nil
  ): DataFrame = fillDirectional(df, tsCol, valueCols, limit, seriesCols, desc = false)

  /** Backward-fill (reference fillna(method="bfill", limit=n)) — the same
    * algebra over the reversed ordering.
    */
  def bfill(
      df: DataFrame,
      tsCol: String,
      valueCols: Seq[String],
      limit: Option[Int] = None,
      seriesCols: Seq[String] = Nil
  ): DataFrame = fillDirectional(df, tsCol, valueCols, limit, seriesCols, desc = true)

  private def fillDirectional(
      df: DataFrame,
      tsCol: String,
      valueCols: Seq[String],
      limit: Option[Int],
      seriesCols: Seq[String],
      desc: Boolean
  ): DataFrame = {
    val w = baseWindow(seriesCols, tsCol, desc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    limit match {
      case None =>
        valueCols.foldLeft(df) { (acc, c) =>
          acc.withColumn(c, last(col(c), ignoreNulls = true).over(running))
        }
      case Some(n) =>
        val withRn = df.withColumn("__rn", row_number().over(w))
        val filled = valueCols.foldLeft(withRn) { (acc, c) =>
          val anchor =
            max(when(col(c).isNotNull, col("__rn"))).over(running)
          val fillVal = last(col(c), ignoreNulls = true).over(running)
          acc.withColumn(
            c,
            when(col(c).isNotNull, col(c))
              .when(anchor.isNotNull && (col("__rn") - anchor) <= n, fillVal)
              .otherwise(col(c))
          )
        }
        filled.drop("__rn")
    }
  }

  /** Time-weighted linear interpolation (W5; reference
    * df.interpolate(method="time", limit=n), load_file.py:2346-2347).
    *
    * For a null at time t between valid neighbors (pv@pt, nv@nt):
    *   pv + (nv - pv) * (t - pt) / (nt - pt)
    * Pandas edges: leading nulls stay null; trailing nulls carry the last
    * valid value; `limit` bounds consecutive filled nulls forward.
    */
  def interpolateTime(
      df: DataFrame,
      tsCol: String,
      valueCols: Seq[String],
      limit: Option[Int] = None,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    val wAsc = baseWindow(seriesCols, tsCol, desc = false)
    val back = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward neighbor via a RUNNING window over descending order:
    // [currentRow, unboundedFollowing] frames are O(n^2) in Spark (re-eval
    // per row); the reversed running frame is incremental O(n)
    val fwd = baseWindow(seriesCols, tsCol, desc = true)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = (unix_micros(col(tsCol)).cast("double") / 1e6)

    val withRn = df.withColumn("__rn", row_number().over(wAsc))
    val out = valueCols.foldLeft(withRn) { (acc, c) =>
      val v = col(c).cast("double")
      val validTs = when(col(c).isNotNull, t)
      val pv = last(v, ignoreNulls = true).over(back)
      val pt = last(validTs, ignoreNulls = true).over(back)
      val nv = last(v, ignoreNulls = true).over(fwd)
      val nt = last(validTs, ignoreNulls = true).over(fwd)
      val interp = when(col(c).isNotNull, v)
        .when(pv.isNull, lit(null).cast("double")) // leading nulls stay null
        .when(nv.isNull, pv) // trailing nulls: carry last valid
        .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
      limit match {
        case None => acc.withColumn(c, interp)
        case Some(n) =>
          val anchor = max(when(col(c).isNotNull, col("__rn"))).over(back)
          acc.withColumn(
            c,
            when(col(c).isNotNull, v)
              .when(anchor.isNotNull && (col("__rn") - anchor) <= n, interp)
              .otherwise(col(c).cast("double"))
          )
      }
    }
    out.drop("__rn")
  }
}
