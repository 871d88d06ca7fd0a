package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossCorrSpec extends SparkSpec {
  import spark.implicits._

  // b is a copy of a shifted one bucket later; c is a's negation.
  // A non-linear base pattern so only the TRUE lag correlates perfectly.
  private def fixture = {
    val base = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L, 7L, 6L, 2L)
    val a = base.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
    val b = base.zipWithIndex.map { case (v, i) => ("b", i.toLong + 1, v) }
    val c = base.zipWithIndex.map { case (v, i) => ("c", i.toLong, -v) }
    (a ++ b ++ c).toDF("s", "bucket", "v")
  }

  private def corrAt(rows: Array[org.apache.spark.sql.Row],
      sa: String, sb: String, lag: Int): Option[Double] = {
    val r = rows.find(r => r.getString(0) == sa && r.getString(1) == sb &&
      r.getInt(2) == lag).get
    if (r.isNullAt(r.fieldIndex("xcorr"))) None
    else Some(r.getDouble(r.fieldIndex("xcorr")))
  }

  test("crossCorrelation recovers the planted lead/lag structure") {
    val out = CrossCorr.crossCorrelation(fixture, "s", "bucket", "v",
      maxLag = 2).collect()
    // b lags a by +1: corr(x_t, y_{t+1}) = 1 exactly
    assert(math.abs(corrAt(out, "a", "b", 1).get - 1.0) < 1e-12)
    // at the wrong lag the non-linear pattern must NOT be perfectly aligned
    assert(corrAt(out, "a", "b", 0).forall(c => math.abs(c) < 0.999))
    // c is a's negation at lag 0: corr = -1 exactly
    assert(math.abs(corrAt(out, "a", "c", 0).get + 1.0) < 1e-12)
  }

  test("only ordered pairs (a < b) appear; n_overlap shrinks off the " +
    "common support; degenerate overlap yields null") {
    val out = CrossCorr.crossCorrelation(fixture, "s", "bucket", "v",
      maxLag = 2).collect()
    assert(out.forall(r => r.getString(0) < r.getString(1)))
    val full = corrRow(out, "a", "c", 0).getLong(3)
    val shifted = corrRow(out, "a", "c", 2).getLong(3)
    assert(full == 10 && shifted == 8, s"overlaps $full/$shifted")

    // two constant series: zero variance everywhere -> xcorr null
    val const = Seq(("x", 0L, 5L), ("x", 1L, 5L), ("y", 0L, 5L), ("y", 1L, 5L))
      .toDF("s", "bucket", "v")
    val cc = CrossCorr.crossCorrelation(const, "s", "bucket", "v", maxLag = 0)
      .collect()
    assert(cc.length == 1 && cc.head.isNullAt(cc.head.fieldIndex("xcorr")))
  }

  private def corrRow(rows: Array[org.apache.spark.sql.Row],
      sa: String, sb: String, lag: Int) =
    rows.find(r => r.getString(0) == sa && r.getString(1) == sb &&
      r.getInt(2) == lag).get

  test("rejects non-integral value columns (exact-sum contract)") {
    val floats = Seq(("a", 0L, 1.5)).toDF("s", "bucket", "v")
    intercept[IllegalArgumentException] {
      CrossCorr.crossCorrelation(floats, "s", "bucket", "v")
    }
  }

  test("plan: equi-join on the bucket index (hash join, not a nested-loop " +
    "pair blowup)") {
    val plan = CrossCorr.crossCorrelation(fixture, "s", "bucket", "v",
      maxLag = 2).queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct") &&
      !plan.contains("broadcastnestedloop"),
      s"pair matching must stay an equi-join:\n$plan")
  }
}
