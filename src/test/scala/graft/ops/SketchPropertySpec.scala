package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck invariants for the bit-algebra operators (fixed seeds, the
  * PropertySpec convention — one Spark job per batch of generated cases,
  * not one per trial).
  */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("HDR bucket invariants on random longs: lo <= v < lo + width, " +
    "idx monotone in v") {
    val vs = cases(Gen.choose(0L, 1L << 50), 200, 11L).distinct.sorted
    val rows = vs.toDF("v")
      .select(col("v"), expr(graft.ops.HdrHist.idxSql("v", "div")).as("idx"))
      .withColumn("lo", expr(graft.ops.HdrHist.loSql("idx", "div")))
      .orderBy("v")
      .collect()
    rows.foreach { r =>
      val (v, lo) = (r.getLong(0), r.getLong(2))
      assert(lo <= v && v - lo <= math.max(lo / 32, 0), s"bounds for $v")
    }
    val idxs = rows.map(_.getLong(1))
    assert(idxs.zip(idxs.tail).forall { case (a, b) => a <= b },
      "bucket index must be monotone in the value")
  }

  test("Morton interleave is a bijection: de-interleaving recovers both keys") {
    val pairs = cases(
      Gen.zip(Gen.choose(0L, (1L << 20) - 1), Gen.choose(0L, (1L << 20) - 1)),
      200, 23L).distinct
    val back = pairs.toDF("a", "b")
      .withColumn("z",
        graft.sources.ZOrder.interleave2(col("a"), col("b"), 20))
      // de-interleave: collect even/odd bits back into each key
      .withColumn("a2", (0 until 20).map(i =>
        shiftleft(shiftrightunsigned(col("z"), 2 * i).bitwiseAND(lit(1L)), i))
        .reduce(_ bitwiseOR _))
      .withColumn("b2", (0 until 20).map(i =>
        shiftleft(shiftrightunsigned(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i))
        .reduce(_ bitwiseOR _))
      .collect()
    back.foreach { r =>
      assert(r.getAs[Long]("a2") == r.getAs[Long]("a") &&
        r.getAs[Long]("b2") == r.getAs[Long]("b"),
        s"roundtrip failed for ${r.getAs[Long]("a")},${r.getAs[Long]("b")}")
    }
    assert(back.map(_.getAs[Long]("z")).distinct.length == back.length,
      "distinct inputs must map to distinct z values")
  }
}
