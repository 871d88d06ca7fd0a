package graft.ts

import graft.SparkSpec

class PointProcessSpec extends SparkSpec {
  import spark.implicits._

  test("hawkesSummary: hand-stepped two-event decay; bursts go hot while " +
    "a slow stream never does") {
    // two events 1h apart, tau=1h: decay_u = round(exp(-1)*1e6) = 367879
    val two = Seq(("u", 1L, ts("2024-01-01 00:00:00")),
      ("u", 2L, ts("2024-01-01 01:00:00"))).toDF("uid", "eid", "t")
    val r = PointProcess.hawkesSummary(two, "t", Seq("t", "eid"), Seq("uid"))
      .collect().head
    // event1: decayed 0, lambda = mu = 100000, A = 500000
    // event2: decayed = 500000*367879 div 1e6 = 183939,
    //         lambda = 283939, A = 683939
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("final_a_u") == 683939L, s"$r")
    assert(r.getAs[Long]("max_lambda_u") == 283939L)
    assert(r.getAs[Long]("n_hot") == 0L)
    // a 5-event burst inside one minute: each bump barely decays, so the
    // pre-bump intensity crosses mu + 2*alpha by the 3rd arrival
    val burst = (0 to 4).map(i =>
      ("b", i.toLong, ts(f"2024-01-01 00:00:${i * 10}%02d"))).toDF("uid", "eid", "t")
    val rb = PointProcess.hawkesSummary(burst, "t", Seq("t", "eid"), Seq("uid"))
      .collect().head
    assert(rb.getAs[Long]("n_hot") >= 2L, s"burst must go hot: $rb")
    assert(rb.getAs[Long]("max_lambda_u") > 1500000L)
    // the same 5 events spread a day apart: fully decayed, never hot
    val slow = (0 to 4).map(i =>
      ("s", i.toLong, ts(s"2024-01-0${i + 1} 00:00:00"))).toDF("uid", "eid", "t")
    val rs = PointProcess.hawkesSummary(slow, "t", Seq("t", "eid"), Seq("uid"))
      .collect().head
    assert(rs.getAs[Long]("n_hot") == 0L)
    assert(rs.getAs[Long]("max_lambda_u") < 200000L)
  }
}
