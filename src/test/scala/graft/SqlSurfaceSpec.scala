package graft

import org.apache.spark.sql.functions._

/** The SQL entry point: temp views + spark.sql must express the same
  * operators the DataFrame API does (Catalyst parses both into the same
  * plans), including our registered native functions.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("spark.sql over a temp view matches the DataFrame formulation") {
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1.0),
      ("u1", ts("2024-01-01 10:30:00"), 3.0),
      ("u2", ts("2024-01-01 10:10:00"), 5.0)
    ).toDF("user_id", "ts", "value")
    ev.createOrReplaceTempView("sql_events")

    val viaSql = spark.sql(
      """SELECT user_id, window.start AS bucket, avg(value) AS mean_v
        |FROM sql_events GROUP BY user_id, window(ts, '1 hour')
        |ORDER BY user_id""".stripMargin).collect()
    val viaDf = ev.groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(avg(col("value")).as("mean_v"))
      .select(col("user_id"), col("window.start").as("bucket"), col("mean_v"))
      .orderBy("user_id").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("registered native functions work in SQL with registered views") {
    graft.functions.vector.register(spark)
    Seq((Array(1.0f, 2.0f), Array(2.0, 1.0))).toDF("a", "b")
      .createOrReplaceTempView("sql_vecs")
    val r = spark.sql("SELECT array_dot(a, b) AS d FROM sql_vecs").head()
    assert(r.getDouble(0) == 4.0)
  }

  test("ewma_fold is SQL-registered") {
    graft.functions.series.register(spark)
    // frame [10, null, 30], alpha=0.5: weights 0.25/0.5/1 by recency;
    // num = 10*0.25 + 30*1 = 32.5, den = 0.25 + 1 = 1.25 -> 26.0
    Seq(Tuple1(Seq(Some(10.0), None, Some(30.0))))
      .toDF("vs")
      .selectExpr("transform(vs, x -> struct(x AS v)) AS frame")
      .createOrReplaceTempView("sql_ewma")
    val r = spark.sql("SELECT ewma_fold(frame, 0.5D) AS e FROM sql_ewma").head()
    assert(r.getDouble(0) == 26.0)
  }

  test("session_window is SQL-expressible too") {
    Seq(("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 12:00:00")))
      .toDF("k", "ts").createOrReplaceTempView("sql_sess")
    val n = spark.sql(
      "SELECT k, session_window(ts, '30 minutes'), count(*) FROM sql_sess GROUP BY 1, 2")
      .count()
    assert(n == 2)
  }

  test("graft_resample TABLE function: the flagship resample pipeline is " +
    "SQL-invocable and matches the DataFrame formulation row-for-row") {
    graft.functions.tablefuncs.register(spark)
    val ev = Seq(
      (ts("2024-01-01 10:05:00"), 1.0),
      (ts("2024-01-01 10:40:00"), 3.0),
      (ts("2024-01-01 12:10:00"), 8.0) // hour 11 has no data -> ffill
    ).toDF("ts", "value")
    ev.createOrReplaceTempView("sql_resample_events")
    val viaSql = spark.sql(
      """SELECT * FROM graft_resample('sql_resample_events', 'ts', '1h',
        |                             'mean', 'ffill')
        |ORDER BY ts""".stripMargin).collect()
    val viaDf = graft.ts.Resample.resampleTimeSeries(
        spark.table("sql_resample_events"), "ts", "1h",
        methodResample = Some("mean"), methodFill = Some("ffill"))
      .orderBy("ts").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
    assert(viaSql.length == 3) // grid 10:05, 11:05, 12:05
    // the hour-11 grid point carries the forward-filled hour-10 mean
    assert(viaSql(1).getDouble(1) == 2.0, viaSql.mkString(", "))
    // pure-reindex 3-arg form works too (no method args)
    val reindex = spark.sql(
      "SELECT * FROM graft_resample('sql_resample_events', 'ts', '1h')")
    assert(reindex.count() == 3)
  }
}
