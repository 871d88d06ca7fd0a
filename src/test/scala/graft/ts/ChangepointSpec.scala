package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  test("clean step shift localizes at the last pre-step row, exact stats") {
    // 10 x 100 then 10 x 200 — mean 150, |S| peaks at t=10 with
    // num = n*rs - rc*s = 20*1000 - 10*3000 = -10000
    val rows = (1 to 20).map(i => (i.toLong, if (i <= 10) 100L else 200L))
    val got = Changepoint
      .cusumArgmax(rows.toDF("pos", "x"), Seq("pos"), "x")
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("pos") == 10L)
    assert(r.getAs[Long]("n_pre") == 10L && r.getAs[Long]("n_post") == 10L)
    assert(r.getAs[Long]("sum_pre") == 1000L && r.getAs[Long]("sum_post") == 2000L)
    assert(r.getAs[Long]("cusum_num") == -10000L)
  }

  test("constant series: all numerators zero, tie resolves to first row") {
    val rows = (1 to 5).map(i => (i.toLong, 7L))
    val r = Changepoint
      .cusumArgmax(rows.toDF("pos", "x"), Seq("pos"), "x")
      .collect()
      .head
    assert(r.getAs[Long]("pos") == 1L)
    assert(r.getAs[Long]("cusum_num") == 0L)
  }

  test("keyed series localize independently; float input is rejected") {
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 50L), ("a", 4L, 50L),
      ("b", 1L, 5L), ("b", 2L, 9L), ("b", 3L, 5L), ("b", 4L, 5L))
    val got = Changepoint
      .cusumArgmax(rows.toDF("k", "pos", "x"), Seq("pos"), "x", Seq("k"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("pos"))
      .toMap
    assert(got("a") == 2L, "step boundary for series a")
    assert(got("b") == 2L, "single spike peaks |S| at the spike row")

    intercept[IllegalArgumentException] {
      Changepoint.cusumArgmax(
        Seq((1L, 1.5)).toDF("pos", "x"), Seq("pos"), "x")
    }
  }

  test("binseg2: a two-step staircase localizes BOTH steps — the root " +
    "finds one, the half-split recovers the other") {
    // 0...0 (10) | 100...100 (10) | 200...200 (10): root cp at a step
    // boundary, then each half holds exactly one remaining step
    val xs = Seq.fill(10)(0L) ++ Seq.fill(10)(100L) ++ Seq.fill(10)(200L)
    val df = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong + 1, x) }
      .toDF("k", "pos", "x")
    val out = Changepoint.binseg2(df, Seq("pos"), "x", Seq("k"))
      .orderBy("level", "segment").collect()
    assert(out.length == 3)
    val root = out(0)
    assert(root.getInt(root.fieldIndex("level")) == 1)
    val rootPos = root.getLong(root.fieldIndex("pos"))
    // symmetric staircase: the root argmax lands on either step boundary
    assert(rootPos == 10L || rootPos == 20L, s"root at $rootPos")
    // the two level-2 rows must BETWEEN them pin both boundaries {10, 20}
    val l2pos = out.drop(1).map(r => r.getLong(r.fieldIndex("pos"))).toSet
    assert(l2pos.contains(if (rootPos == 10L) 20L else 10L),
      s"the other step must surface in a half: root=$rootPos l2=$l2pos")
    // every reported statistic row carries the full-series/segment n
    assert(root.getAs[Long]("n") == 30L)
  }
}
