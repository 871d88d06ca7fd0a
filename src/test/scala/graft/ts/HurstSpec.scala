package graft.ts

import graft.SparkSpec
import java.sql.Timestamp

class HurstSpec extends SparkSpec {
  import spark.implicits._

  private def series(xs: Seq[Long]): org.apache.spark.sql.DataFrame =
    xs.zipWithIndex.map { case (x, i) =>
      (new Timestamp(1700000000000L + i * 60000L), x)
    }.toDF("ts", "v")

  private def run(xs: Seq[Long], m: Int, ks: Seq[Int]) =
    Hurst.aggVar(series(xs), "ts", "v", m, ks).collect().head

  test("vnum matches the hand-computed variance numerator on a tiny fixture") {
    // m=4 evenly spaced points -> one per bucket; vec = (1, 5, 3, 7)
    val r = run(Seq(1L, 5L, 3L, 7L), m = 4, ks = Seq(1, 2))
    assert(r.getAs[Long]("total_units") == 16L)
    // k=1: 4*Σx² − 16² = 4*84 − 256
    assert(r.getAs[Double]("vnum_1") == (4L * 84L - 256L).toDouble)
    // k=2: blocks (6, 10): 2*(36+100) − 16²
    assert(r.getAs[Double]("vnum_2") == (2L * 136L - 256L).toDouble)
  }

  test("constant-block series hits the v_num<=0 guard: hurst is null") {
    // alternating 1,0 -> every k=2 block sums to 1, variance exactly 0
    val r = run(Seq.tabulate(16)(i => (i % 2).toLong), m = 16, ks = Seq(1, 2, 4))
    assert(r.getAs[Double]("vnum_2") == 0.0)
    assert(r.isNullAt(r.fieldIndex("hurst")))
  }

  test("linear ramp (pure trend) scores persistent, white noise near 0.5") {
    val ramp = run(Seq.tabulate(64)(i => i.toLong * 10L),
      m = 64, ks = Seq(1, 2, 4, 8))
    assert(ramp.getAs[Double]("hurst") > 0.85,
      s"trend must read persistent, got ${ramp.getAs[Double]("hurst")}")
    var s = 777L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val noise = run(Seq.fill(256)(next() % 1000), m = 64, ks = Seq(1, 2, 4, 8))
    val h = noise.getAs[Double]("hurst")
    assert(h > 0.2 && h < 0.75, s"iid noise must sit near 0.5, got $h")
    assert(ramp.getAs[Double]("hurst") > h)
  }
}
