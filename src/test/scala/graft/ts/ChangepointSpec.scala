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
}
