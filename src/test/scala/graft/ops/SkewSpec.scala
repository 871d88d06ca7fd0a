package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a cold key
  private def skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => ("cold", i.toDouble))).toDF("k", "v").repartition(8)

  test("saltedAggregate matches plain groupBy results") {
    val out = Skew.saltedAggregate(skewed, Seq("k"), Seq(
      "total" -> (sum(col("v")), sum(col("total"))),
      "n" -> (count(lit(1)), sum(col("n"))),
      "mx" -> (max(col("v")), max(col("mx")))
    )).orderBy("k").collect()
    assert(out.length == 2)
    val cold = out(0); val hot = out(1)
    assert(cold.getDouble(1) == 5050.0 && cold.getLong(2) == 100L && cold.getDouble(3) == 100.0)
    assert(hot.getDouble(1) == 405450.0 && hot.getLong(2) == 900L && hot.getDouble(3) == 900.0)
  }

  test("saltedAvg matches plain avg") {
    val out = Skew.saltedAvg(skewed, Seq("k"), "v").orderBy("k").collect()
    assert(math.abs(out(0).getDouble(1) - 50.5) < 1e-9)   // cold: mean 1..100
    assert(math.abs(out(1).getDouble(1) - 450.5) < 1e-9)  // hot: mean 1..900
  }

  test("saltedJoinSmallRight preserves join semantics") {
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "label")
    val out = Skew.saltedJoinSmallRight(skewed, dim, "k")
    assert(out.count() == 1000)
    assert(out.filter(col("label") === "H").count() == 900)
    assert(out.columns.toSet == Set("k", "v", "label"))
  }

  test("bloomPrunedJoin == plain join (no false negatives; false positives " +
    "fall out of the equi-join); prune filter sits under the join") {
    val big = (1L to 2000L).map(i => (i, i % 7)).toDF("bk", "payload")
    val small = Seq(3L, 700L, 1999L).map(k => Tuple1(k)).toDF("sk")
    val out = Skew.bloomPrunedJoin(big, small, "bk", "sk")
    val got = out.select("bk").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L, 700L, 1999L), s"must equal the plain join: $got")
    // tiny bit table forces real false positives; they must still vanish
    val fp = Skew.bloomPrunedJoin(big, small, "bk", "sk", k = 2, mBits = 64)
    assert(fp.select("bk").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 700L, 1999L), "false positives must fall out of the join")
    // the membership probe must run on the big side BEFORE its join
    // exchange: the packed-word k-probe (xxhash64 positions into the
    // broadcast __words table) sits below any sort-merge exchange
    val plan = out.queryExecution.executedPlan.toString
    val filterPos = plan.indexOf("xxhash64")
    assert(filterPos >= 0, s"probe filter missing:\n$plan")
  }
}
