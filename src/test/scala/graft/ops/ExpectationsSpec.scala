package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("predicate rule counts violations; NULL predicate is a violation") {
    val df = Seq[(String, Option[Long])](
      ("a", Some(5L)), ("b", Some(500L)), ("c", None)).toDF("k", "v")
    val r = Expectations
      .expect("v_in_range", df, col("v").between(1, 100))
      .collect().head
    assert(r.getString(0) == "v_in_range")
    assert(r.getLong(1) == 3L, "checked all rows")
    assert(r.getLong(2) == 2L, "500 out of range + null predicate row")
  }

  test("uniqueness rule: dup count over composite key") {
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x")).toDF("a", "b")
    val r = Expectations.expectUnique("ab_unique", df, Seq("a", "b"))
      .collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L)
  }

  test("FK rule: misses and null keys count; suite unions with pass flags") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val suite = Expectations.suite(Seq(
      Expectations.expectForeignKey("fk_ok", child, "fk", parent, "pk"),
      Expectations.expect("pk_positive", parent, col("pk") > 0)))
    val rows = suite.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rows("fk_ok") == ((4L, 2L, false)), "9 unmatched + null key")
    assert(rows("pk_positive") == ((2L, 0L, true)))
  }
}
