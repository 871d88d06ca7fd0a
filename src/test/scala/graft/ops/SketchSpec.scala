package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // 2000 occurrences over a skewed vocabulary: word w_i appears i times
  // for i in 1..62 (Σ = 1953) plus one heavy hitter 'hh' x 47
  private def occurrences = {
    val rows = (1 to 62).flatMap(i => Seq.fill(i)(f"w$i%02d")) ++
      Seq.fill(47)("hh")
    rows.toDF("word")
  }

  test("CMS: estimate >= exact always; a sketch wider than the vocabulary " +
    "is exact for every key") {
    val occ = occurrences
    val exact = occ.groupBy("word").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = exact.keys.toSeq.toDF("word")

    val tight = Sketch.cmsLookup(
      Sketch.cmsBuild(occ, "word", depth = 4, width = 16),
      probes, "word", depth = 4, width = 16).collect()
    tight.foreach { r =>
      assert(r.getLong(1) >= exact(r.getString(0)),
        s"CMS undercounted ${r.getString(0)}")
    }
    // 63 keys into 4x16 buckets collide somewhere: overcount must be visible
    assert(tight.exists(r => r.getLong(1) > exact(r.getString(0))),
      "16-wide sketch over 63 keys produced no collision — hash family broken?")

    val wide = Sketch.cmsLookup(
      Sketch.cmsBuild(occ, "word", depth = 4, width = 4096),
      probes, "word", depth = 4, width = 4096).collect()
    wide.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"4096-wide sketch should be exact for 63 keys, got $r")
    }
  }

  test("CMS: unseen keys estimate 0 on a wide sketch") {
    val sk = Sketch.cmsBuild(occurrences, "word", depth = 4, width = 4096)
    val out = Sketch.cmsLookup(sk, Seq("never-seen").toDF("word"), "word",
      depth = 4, width = 4096).collect()
    assert(out.head.getLong(1) == 0L)
  }

  test("Bloom: no false negatives ever; tiny filters produce false " +
    "positives; adequately-sized filters don't (at this load)") {
    val members = (1 to 200).map(i => s"m$i").toDF("k")
    val memberSet = (1 to 200).map(i => s"m$i").toSet
    val probes = ((1 to 200).map(i => s"m$i") ++
      (1 to 2000).map(i => s"x$i")).toDF("k")

    // 200 keys x 4 hashes into 256 bits: heavily loaded, FPs certain
    val tinyBits = Sketch.bloomBits(members, "k", k = 4, mBits = 256)
    val tiny = Sketch.bloomProbe(probes, "k", tinyBits, k = 4, mBits = 256)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    memberSet.foreach(m => assert(tiny(m), s"false negative on $m"))
    assert(tiny.exists { case (k, hit) => hit && !memberSet(k) },
      "256-bit filter at 3x overload produced no false positive")

    // 2^16 bits at the same load: FP rate ~(800/65536)^4 ~ 2e-8
    val bigBits = Sketch.bloomBits(members, "k", k = 4, mBits = 1 << 16)
    val big = Sketch.bloomProbe(probes, "k", bigBits, k = 4, mBits = 1 << 16)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    memberSet.foreach(m => assert(big(m), s"false negative on $m"))
    assert(big.count { case (k, hit) => hit && !memberSet(k) } == 0,
      "64Ki-bit filter fired a false positive at 1.2% load")
  }

  test("HLL: estimate lands within 3 sigma (39%) of truth across decades; " +
    "registers are <= 64 rows per group") {
    val fixture = Seq(100, 1000, 10000).flatMap { n =>
      (1 to n).map(i => (s"g$n", s"k$i"))
    }.toDF("g", "k")
    val regs = Sketch.hllRegisters(fixture, "k", Seq("g"))
    val perGroup = regs.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perGroup.foreach { case (g, n) => assert(n <= 64, s"$g has $n registers") }

    val est = Sketch.hllEstimate(regs, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("hll_est"))).toMap
    Seq(100, 1000, 10000).foreach { n =>
      val e = est(s"g$n").toDouble
      assert(math.abs(e - n) / n < 0.39,
        s"HLL estimate $e for true $n outside 3-sigma band")
    }
  }

  test("HLL: the linear-counting branch fires for tiny cardinalities and " +
    "is near-exact there") {
    val small = (1 to 8).map(i => ("g", s"k$i")).toDF("g", "k")
    val out = Sketch.hllEstimate(
      Sketch.hllRegisters(small, "k", Seq("g")), Seq("g")).collect().head
    val vZero = out.getInt(out.fieldIndex("v_zero"))
    assert(vZero > 0 && vZero >= 64 - 8, s"v_zero=$vZero with 8 keys")
    val e = out.getLong(out.fieldIndex("hll_est"))
    // linear counting at 12% load: expect within ±2 of 8
    assert(math.abs(e - 8L) <= 2, s"LC estimate $e for true 8")
  }

  test("merge algebra: sketch(A) merge sketch(B) EQUALS sketch(A union B) " +
    "— table-exact, for all three sketches") {
    val occ = occurrences
    val a = occ.filter(md5(col("word")).substr(1, 1) < "8")
    val b = occ.filter(md5(col("word")).substr(1, 1) >= "8")

    def table(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    assert(table(Sketch.cmsMerge(
        Sketch.cmsBuild(a, "word"), Sketch.cmsBuild(b, "word"))) ==
      table(Sketch.cmsBuild(occ, "word")),
      "CMS merge != CMS of union")

    assert(table(Sketch.bloomMerge(
        Sketch.bloomBits(a, "word"), Sketch.bloomBits(b, "word"))) ==
      table(Sketch.bloomBits(occ, "word")),
      "Bloom merge != Bloom of union")

    val g = occ.withColumn("g", lit("all"))
    val ga = a.withColumn("g", lit("all"))
    val gb = b.withColumn("g", lit("all"))
    assert(table(Sketch.hllMerge(
        Sketch.hllRegisters(ga, "word", Seq("g")),
        Sketch.hllRegisters(gb, "word", Seq("g")), Seq("g"))) ==
      table(Sketch.hllRegisters(g, "word", Seq("g"))),
      "HLL merge != HLL of union")
  }

  test("streaming: cmsBuild and hllRegisters run unchanged as stateful " +
    "streaming aggregations and converge to the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val words = occurrences.collect().map(_.getString(0))

    val in1 = MemoryStream[String]
    val q1 = Sketch.cmsBuild(in1.toDF().toDF("word"), "word")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    val in2 = MemoryStream[String]
    val q2 = Sketch.hllRegisters(
        in2.toDF().toDF("word").withColumn("g", lit("all")), "word", Seq("g"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val (h1, h2) = words.splitAt(words.length / 2)
      in1.addData(h1); in2.addData(h1)
      q1.processAllAvailable(); q2.processAllAvailable()
      in1.addData(h2); in2.addData(h2)
      q1.processAllAvailable(); q2.processAllAvailable()

      def table(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
        df.collect().map(_.toSeq).toSet
      assert(table(spark.table("cms_stream")) ==
        table(Sketch.cmsBuild(occurrences, "word")),
        "streamed CMS diverged from the batch sketch")
      assert(table(spark.table("hll_stream")) ==
        table(Sketch.hllRegisters(
          occurrences.withColumn("g", lit("all")), "word", Seq("g"))),
        "streamed HLL registers diverged from the batch sketch")
    } finally { q1.stop(); q2.stop() }
  }

  test("plan: sketch and bit tables join BROADCAST on the probe side " +
    "(the probe stream never shuffles to meet the sketch)") {
    val occ = occurrences
    val lookPlan = Sketch.cmsLookup(
      Sketch.cmsBuild(occ, "word"), occ.distinct(), "word")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(lookPlan.contains("broadcast"),
      s"CMS lookup should broadcast the sketch:\n$lookPlan")

    val probePlan = Sketch.bloomProbe(occ, "word",
      Sketch.bloomBits(occ, "word"), k = 4, mBits = 1 << 14)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(probePlan.contains("broadcast"),
      s"Bloom probe should broadcast the bit table:\n$probePlan")
  }

  test("bloomWords: zero false negatives, dense word layout, and a " +
    "non-member FPR in the designed band at 8 bits/key") {
    val members = (0L until 3000L).map(i => i * 7919L + 13L)
    val mBits = ((8L * members.size + 63L) / 64L) * 64L // 8 bits/key
    val words = Sketch.bloomWords(members.toDF("key"), "key",
      k = 3, mBits = mBits)
    val row = words.collect().head.getSeq[Long](0)
    assert(row.size == (mBits / 64L).toInt,
      s"dense layout: expected ${mBits / 64} words, got ${row.size}")

    val memberMiss = members.toDF("key").crossJoin(broadcast(words))
      .filter(!Sketch.wordsMightContain(col("key"), col("__words"),
        k = 3, mBits = mBits))
      .count()
    assert(memberMiss == 0L, s"false negatives: $memberMiss")

    // disjoint probe set (different residue class)
    val probes = (0L until 20000L).map(i => i * 7919L + 14L)
    val fp = probes.toDF("key").crossJoin(broadcast(words))
      .filter(Sketch.wordsMightContain(col("key"), col("__words"),
        k = 3, mBits = mBits))
      .count()
    val rate = fp.toDouble / probes.size
    assert(rate > 0.001 && rate < 0.10,
      s"FPR at 8 bits/key, k=3 should sit near 3%, got $rate ($fp)")
  }

  test("bloomWords: assumeDistinct on pre-distinct keys builds the " +
    "identical table") {
    val keys = (0L until 500L).map(i => i * 31L).toDF("key")
    val a = Sketch.bloomWords(keys, "key", k = 3, mBits = 4096)
      .collect().head.getSeq[Long](0)
    val b = Sketch.bloomWords(keys, "key", k = 3, mBits = 4096,
      assumeDistinct = true).collect().head.getSeq[Long](0)
    assert(a == b)
  }
}
