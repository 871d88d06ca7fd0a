package graft.ops

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val batchA = Seq(("x", 10L), ("x", 20L), ("y", 5L))
  private val batchB = Seq(("x", 30L), ("z", 7L)) // z only in B, y only in A

  private def stateMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_v"), r.getAs[Long]("min_v"),
          r.getAs[Long]("max_v"), r.getAs[Long]("sum_sq")))
      .toMap

  test("merge of batch states == state of concatenated batches") {
    val merged = Incremental.mergeState(
      Incremental.aggState(batchA.toDF("g", "v"), Seq("g"), "v"),
      Incremental.aggState(batchB.toDF("g", "v"), Seq("g"), "v"),
      Seq("g"))
    val whole = Incremental.aggState(
      (batchA ++ batchB).toDF("g", "v"), Seq("g"), "v")
    assert(stateMap(merged) == stateMap(whole))
    assert(stateMap(merged).keySet == Set("x", "y", "z"),
      "one-sided groups survive the merge")
  }

  test("finalize: exact mean and population variance") {
    val fin = Incremental
      .finalize(
        Incremental.aggState(batchA.toDF("g", "v"), Seq("g"), "v"), Seq("g"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("mean"), r.getAs[Double]("variance")))
      .toMap
    assert(fin("x")._1 == 15.0)
    assert(fin("x")._2 == 25.0) // E[v^2]-E[v]^2 = (100+400)/2 - 225
    assert(fin("y")._1 == 5.0 && fin("y")._2 == 0.0)
  }

  test("applyChanges: last change per key wins, final deletes drop the " +
    "key, untouched keys pass through, resurrect-after-delete works") {
    import org.apache.spark.sql.functions.col
    val snapshot = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("k", "v")
    val changes = Seq(
      (1L, 11L, "upsert", 1L), (1L, 12L, "upsert", 2L), // last wins -> 12
      (2L, 0L, "delete", 1L),                           // dropped
      (3L, 0L, "delete", 1L), (3L, 33L, "upsert", 2L),  // delete then upsert -> 33
      (5L, 50L, "upsert", 1L)                           // brand-new key
    ).toDF("k", "v", "op", "pos")
    val out = Incremental.applyChanges(snapshot, changes,
        keyCols = Seq("k"), orderCols = Seq("pos"), opCol = "op")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 12L, 3L -> 33L, 4L -> 40L, 5L -> 50L), out.toString)
    // the snapshot meets the changes only through an ANTI equi-join on the
    // key — it is never window-sorted (the Window nodes sit on the
    // change-batch subtrees only)
    val plan = Incremental.applyChanges(snapshot, changes,
        Seq("k"), Seq("pos"), "op")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("leftanti"), plan)
    assert(!plan.contains("sortmergejoin"), plan)
  }

  test("scd2Intervals: same-value runs collapse to validity intervals, " +
    "value flip-flops reopen, the last run is current") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("u1", 1L, "bronze"), ("u1", 2L, "bronze"), ("u1", 3L, "gold"),
      ("u1", 4L, "bronze"), // back to bronze -> a NEW interval, not a merge
      ("u2", 1L, "silver")
    ).toDF("u", "pos", "tier")
    val out = Incremental.scd2Intervals(rows, "u", Seq("pos"), "tier")
      .orderBy("u", "valid_from")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(r.fieldIndex("valid_from")),
        Option(r.get(r.fieldIndex("valid_to"))),
        r.getBoolean(r.fieldIndex("is_current"))))
    assert(out.toSeq == Seq(
      ("u1", "bronze", 2L, 1L, Some(3L), false),
      ("u1", "gold", 1L, 3L, Some(4L), false),
      ("u1", "bronze", 1L, 4L, None, true),
      ("u2", "silver", 1L, 1L, None, true)), out.toSeq.toString)
    // one keyed exchange serves change detection, runs, and the lead
    val plan = Incremental.scd2Intervals(rows, "u", Seq("pos"), "tier")
      .queryExecution.executedPlan.toString.toLowerCase
    assert("exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
  test("snapshotDiff classifies added/removed/changed/unchanged; nulls do " +
    "not alias across columns") {
    import org.apache.spark.sql.functions._
    val v1 = Seq(
      (1L, Option("a"), Option("x")),   // unchanged
      (2L, Option("a"), Option("x")),   // changed in v2
      (3L, Option("a"), Option("x")),   // removed in v2
      (4L, None, Option("x"))           // null shift: (NULL,x) -> (x,NULL)
    ).toDF("k", "c1", "c2")
    val v2 = Seq(
      (1L, Option("a"), Option("x")),
      (2L, Option("b"), Option("x")),
      (4L, Option("x"), None),          // must read CHANGED, not unchanged
      (5L, Option("n"), Option("n"))    // added
    ).toDF("k", "c1", "c2")
    val out = Incremental.snapshotDiff(v1, v2, Seq("k"), Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
    // scale shape: the full-outer join shuffles only (key, hash) — the
    // compare payload never appears in an exchange subtree
    val wide = v1.withColumn("payload", lit("BIGPAYLOAD"))
    val plan = Incremental.snapshotDiff(wide, v2.withColumn("payload", lit("p")),
        Seq("k"), Seq("payload"))
      .queryExecution.executedPlan.toString.toLowerCase
    val shuffles = plan.split("exchange hashpartitioning").drop(1)
    assert(!shuffles.exists(_.take(200).contains("payload")),
      s"payload must not ride the diff shuffle:\n$plan")
  }

  test("incrementalJoin: view + three delta terms == full recompute, " +
    "including multiplicity on duplicate keys") {
    // duplicate keys on both sides so the test catches a lost or doubled
    // delta term as a multiplicity error, not just a set error
    var s = 2024L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val left = (1 to 80).map(i => (next() % 12, s"l$i"))
    val right = (1 to 40).map(i => (next() % 12, s"r$i"))
    val (ol, dl) = left.splitAt(55)
    val (or_, dr) = right.splitAt(25)
    def df(rows: Seq[(Long, String)], v: String) = rows.toDF("k", v)
    val inc = Incremental.incrementalJoin(
        df(ol, "lv"), df(dl, "lv"), df(or_, "rv"), df(dr, "rv"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val full = df(left, "lv").join(df(right, "rv"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    assert(inc == full)
    assert(full.values.exists(_ > 1) || full.size > 50,
      "fixture must produce real join fan-out")
  }
}
