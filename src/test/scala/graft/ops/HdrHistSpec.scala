package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HdrHistSpec extends SparkSpec {
  import spark.implicits._

  /** Reference index/lo in plain Scala. */
  private def refIdx(v: Long): Long =
    if (v < 32) v
    else {
      val top = 64 - java.lang.Long.numberOfLeadingZeros(v)
      top * 32L + ((v >> (top - 6)) & 31L)
    }
  private def refLo(idx: Long): Long =
    if (idx < 192) idx else (32 + idx % 32) << (idx / 32 - 6)

  test("bucket index and lower bound match the bit formulas; lo <= v < lo + lo/32 + 1") {
    val vs = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 100L, 1000L, 123456L,
      (1L << 40) + 12345L)
    val got = vs.toDF("v")
      .select(col("v"),
        expr(HdrHist.idxSql("v", "div")).as("idx"))
      .withColumn("lo", expr(HdrHist.loSql("idx", "div")))
      .collect()
    got.foreach { r =>
      val (v, idx, lo) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(idx == refIdx(v), s"idx($v)")
      assert(lo == refLo(idx), s"lo($idx)")
      assert(lo <= v, s"lo bound for $v")
      assert(v - lo <= math.max(lo / 32, 0), s"width bound for $v (lo=$lo)")
    }
  }

  test("merge(histA, histB) == histogram(A union B)") {
    val a = (1L to 500L).map(v => ("g", v * 7 % 1000))
    val b = (1L to 300L).map(v => ("g", v * 13 % 2000))
    val ha = HdrHist.histogram(a.toDF("g", "v"), "v", Seq("g"))
    val hb = HdrHist.histogram(b.toDF("g", "v"), "v", Seq("g"))
    val merged = HdrHist.merge(ha, hb, Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = HdrHist.histogram((a ++ b).toDF("g", "v"), "v", Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("streaming: histogram runs unchanged as a stateful streaming " +
    "aggregation and converges to the batch histogram") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val values = (1L to 2000L).map(v => v * 17 % 5000)
    val in = MemoryStream[Long]
    val q = HdrHist.histogram(
        in.toDF().toDF("v").withColumn("g", lit("all")), "v", Seq("g"))
      .writeStream.format("memory").queryName("hdr_stream")
      .outputMode("complete").start()
    try {
      val (h1, h2) = values.splitAt(values.length / 2)
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
      val streamed = spark.table("hdr_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = HdrHist.histogram(
          values.map(("all", _)).toDF("g", "v"), "v", Seq("g"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, "streamed histogram diverged from batch")
    } finally q.stop()
  }

  test("quantile estimate is the bucket floor of the exact ranked value, " +
    "within 1/32 relative error") {
    val vs = (1L to 10000L).map(v => ("g", v))
    val hist = HdrHist.histogram(vs.toDF("g", "v"), "v", Seq("g"))
    val qs = HdrHist.quantiles(hist, Seq("g"), Seq(50, 90, 99))
      .collect().map(r => r.getAs[Int]("q") -> r.getAs[Long]("est")).toMap
    for ((q, est) <- qs) {
      val rank = (q * 10000L + 99) / 100
      val exact = rank // values ARE 1..10000
      assert(est <= exact, s"q$q floor")
      assert(exact - est <= exact / 32 + 1, s"q$q error bound")
      assert(est == refLo(refIdx(exact)), s"q$q est is exact value's bucket lo")
    }
  }
}
