package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook life table with censoring — risk sets " +
    "shrink by deaths AND censored, survival matches the closed form") {
    // subjects: a dies day 1, b dies day 1, c censored day 1 (still alive
    // at cutoff), d dies day 3, e censored day 4
    def ev(u: String, days: Int, lastAt: String) = Seq(
      (u, ts(s"2024-01-01 00:00:00")),
      (u, ts(lastAt))
    )
    val rows =
      ev("a", 1, "2024-01-02 00:00:00") ++
        ev("b", 1, "2024-01-02 00:00:00") ++
        ev("c", 1, "2024-01-02 12:00:00") ++ // censored: last >= cutoff? no
        ev("d", 3, "2024-01-04 00:00:00") ++
        ev("e", 4, "2024-01-05 00:00:00")
    // cutoff 2024-01-05: only e is censored
    val df = rows.toDF("u", "t")
    val out = Survival.kaplanMeier(df, "u", "t",
        to_timestamp(lit("2024-01-05"))).orderBy("t_days").collect()
    // durations: a=1,b=1,c=1(death),d=3(death),e=4(censored)
    // t=1: n_risk=5, d=3 -> S = 2/5; t=3: n_risk=2, d=1 -> S = 2/5 * 1/2
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getAs[Long]("t_days") == 1L)
    assert(r1.getAs[Long]("n_risk") == 5L && r1.getAs[Long]("n_events") == 3L)
    assert(math.abs(r1.getAs[Double]("survival") - 0.4) < 1e-4)
    val r3 = out(1)
    assert(r3.getAs[Long]("t_days") == 3L)
    assert(r3.getAs[Long]("n_risk") == 2L && r3.getAs[Long]("n_events") == 1L)
    assert(math.abs(r3.getAs[Double]("survival") - 0.2) < 1e-4)
    // surv_logu is the exact micro-nat sum: lnU(2)-lnU(5) at t=1
    def lnU(k: Long) = math.round(math.log(k.toDouble) * 1e6)
    assert(r1.getAs[Long]("surv_logu") == lnU(2) - lnU(5))
    assert(r3.getAs[Long]("surv_logu") == lnU(2) - lnU(5) + lnU(1) - lnU(2))
  }

  test("kaplanMeier: a duration where the whole risk set dies pins " +
    "survival to exactly 0.0 without ever evaluating ln(0)") {
    val rows = Seq(
      ("a", ts("2024-01-01 00:00:00")), ("a", ts("2024-01-02 00:00:00")),
      ("b", ts("2024-01-01 00:00:00")), ("b", ts("2024-01-02 00:00:00")))
    val out = Survival.kaplanMeier(rows.toDF("u", "t"), "u", "t",
        to_timestamp(lit("2024-02-01"))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("survival") == 0.0)
    assert(out.head.isNullAt(out.head.fieldIndex("surv_logu")))
  }
}
