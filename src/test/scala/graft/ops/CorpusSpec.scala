package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("shardAssign: stable pseudo-random (shard, pos), dense per-shard positions") {
    val df = (0 until 400).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val out = Corpus.shardAssign(df, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 400)
    // every shard in range, and no shard starved (md5 is uniform)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    assert(byShard.size == 8)
    // positions within a shard are dense 0..n-1 (a dataloader can seek)
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // deterministic: same input -> identical addresses
    val again = Corpus.shardAssign(df, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // the order is actually shuffled, not id order
    val shard0 = out.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
    // a different seed reshuffles
    val reseeded = Corpus.shardAssign(df, "doc_id", nShards = 8, seed = "other")
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(reseeded.sortBy(_._1).map(_._2).toSeq != out.sortBy(_._1).map(_._2).toSeq)
  }

  test("chunkTokens: stride coverage, short tail, empty doc emits nothing") {
    val df = Seq(
      (1L, (1 to 70).map(i => s"w$i").mkString(" ")), // 70 tokens
      (2L, "a b c"),                                  // shorter than a chunk
      (3L, "   ")                                     // whitespace only
    ).toDF("doc_id", "text")
    val out = Corpus.chunkTokens(df, "doc_id", "text", chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: starts 1, 25, 49 -> sizes 32, 32, 22 (tail)
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0L, 1L, 32L), (1L, 1L, 25L, 32L), (1L, 2L, 49L, 22L)))
    // doc 2: one short chunk; doc 3: nothing
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 3L)))
    assert(!out.exists(_._1 == 3L))
    // consecutive chunks overlap by chunkSize - stride = 8 tokens
    val full = Corpus.chunkTokens(df, "doc_id", "text", chunkSize = 32, stride = 24)
    assert(full.filter(col("doc_id") === 1L && col("chunk_idx") === 1L)
      .head().getLong(2) == 25L) // 25 + 32 - 1 = 56 >= 49: covered
  }

  test("writeShards: shard dirs round-trip, file row order IS the pos order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (0 until 200).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    Corpus.writeShards(df, "doc_id", nShards = 4, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == (0 until 4).map(s => s"shard=$s"))
    // within each shard file, parquet row order must equal pos order
    // (what a sequential dataloader relies on)
    dirs.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d should be one task's single file")
      val pos = spark.read.parquet(files.head.getPath)
        .select("pos").collect().map(_.getLong(0)).toSeq
      assert(pos == pos.sorted, s"$d rows must be written in pos order")
      assert(pos == (0L until pos.length).toSeq, s"$d positions must be dense")
    }
    // round-trip preserves every row exactly once
    assert(spark.read.parquet(dir).count() == 200)
  }

  test("blocklistHits counts DISTINCT blocklisted tokens, case-insensitive") {
    val df = Seq(
      (1L, "totally Clean text here"),
      (2L, "SPAM spam and more sPaM"),       // one distinct hit, any case
      (3L, "slow spam stale slow"),          // three distinct hits
      (4L, "spammy slowness")                // substrings do NOT match
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      Corpus.blocklistHits(col("text"), Seq("Slow", "stale", "spam")).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 3L), (4L, 0L)))
  }

  test("quantileBuckets: monotone in score, near-even deciles, full range") {
    val df = (1L to 1000L).map(i => (i, i * 3 % 997)).toDF("id", "score")
    val out = Corpus.quantileBuckets(df, "score", k = 10)
      .select("id", "score", "bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.forall(p => p._2 >= 0 && p._2 <= 9))
    assert(out.map(_._2).distinct.length == 10)
    // monotone: a higher score never gets a lower bucket
    val sorted = out.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, b1), (_, b2)) => assert(b2 >= b1)
      case _ => ()
    }
    // near-even mass per decile (interpolated cuts on ~uniform scores)
    val byBucket = out.groupBy(_._2).view.mapValues(_.length)
    assert(byBucket.values.forall(n => n >= 80 && n <= 120), byBucket.toMap.toString)
  }

  test("splitAssign is deterministic, content-keyed, and respects fractions") {
    val df = (0 until 500).map(i => (i.toLong, s"document body number $i")).toDF("id", "text")
    val out = df.select(col("id"), Corpus.pctBucket(col("text")).as("pct"),
      Corpus.splitAssign(col("text")).as("split"))
    val again = df.select(Corpus.splitAssign(col("text")).as("split"))
    // deterministic across evaluations
    assert(out.select("split").collect().toSeq == again.collect().toSeq)
    // every pct in [0, 100), split consistent with pct
    assert(out.filter(col("pct") < 0 || col("pct") >= 100).count() == 0)
    assert(out.filter(col("pct") < 90 && col("split") =!= "train").count() == 0)
    assert(out.filter(col("pct") >= 95 && col("split") =!= "test").count() == 0)
    // rough proportions (md5 is uniform; 500 docs -> train well above half)
    val train = out.filter(col("split") === "train").count()
    assert(train > 400 && train < 500)
    // identical content always lands in the same split (dup-safety)
    val dup = Seq((1L, "same text"), (2L, "same text")).toDF("id", "text")
      .select(Corpus.splitAssign(col("text")).as("s")).distinct().count()
    assert(dup == 1)
  }

  test("repetitionStats: ratio 0 for all-distinct, high for repeated, 0 for empty") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "x x x x"),
      (3L, ""),
      (4L, "w w y")
    ).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(df, "text").orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(2), out(i).getLong(3), out(i).getDouble(4))
    assert(row(0) == ((4L, 4L, 0.0)))
    assert(row(1) == ((4L, 1L, 0.75)))
    assert(row(2) == ((0L, 0L, 0.0)))
    assert(out(3).getLong(2) == 3L && out(3).getLong(3) == 2L &&
      math.abs(out(3).getDouble(4) - 0.333333) < 1e-9)
  }

  test("PII: counts and redaction for emails and phone numbers") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org or +1 (555) 123-4567 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.co and c.d@e-f.org; phone 555 123 9876")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      Corpus.emailCount(col("text")).as("e"),
      Corpus.phoneCount(col("text")).as("p"),
      Corpus.redactPii(col("text")).as("r")).orderBy("id").collect()
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
    assert(out(0).getString(3) == "reach me at <EMAIL> or <PHONE> ok")
    assert(out(1).getLong(1) == 0L && out(1).getLong(2) == 0L)
    assert(out(1).getString(3) == "no pii here at all")
    assert(out(2).getLong(1) == 2L && out(2).getLong(2) == 1L)
    assert(out(2).getString(3).contains("<EMAIL> and <EMAIL>"))
    assert(out(2).getString(3).contains("phone <PHONE>"))
  }

  test("shinglesFromTokens: n-grams in order, empty when too short") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "too short")
    ).toDF("id", "text").withColumn("toks", Corpus.tokens(col("text")))
    val out = df.select(col("id"),
      Corpus.shinglesFromTokens(col("toks"), 3).as("g")).orderBy("id").collect()
    assert(out(0).getSeq[String](1) == Seq("the quick brown", "quick brown fox"))
    assert(out(1).getSeq[String](1).isEmpty)
  }

  test("dedupLines removes corpus-frequent lines, keeps order, restores empty docs") {
    val boiler = "subscribe now"
    val docs = (1L to 6L).map(i => (i, s"$boiler\nunique line $i\nending $i")) :+
      (7L, boiler) // doc that is ONLY boilerplate
    val out = Corpus.dedupLines(docs.toDF("doc_id", "text"), "doc_id", "text", minCount = 5)
      .orderBy("doc_id").collect()
    // 6 docs keep their two unique lines in original order
    (0 until 6).foreach { i =>
      assert(out(i).getLong(1) == 3L && out(i).getLong(2) == 2L)
      assert(out(i).getString(3) == s"unique line ${i + 1}\nending ${i + 1}")
    }
    // all-boilerplate doc survives as a row with empty text
    assert(out(6).getLong(0) == 7L && out(6).getLong(2) == 0L && out(6).getString(3) == "")
  }

  test("stratifiedSample: per-stratum rates, deterministic, content-keyed") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      s"content $i")).toDF("id", "stratum", "text")
    val out = Corpus.stratifiedSample(df, "stratum", "text",
      Map("a" -> 0.5, "b" -> 0.1))
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform: 1000 docs/stratum -> ~500 and ~100
    assert(byStratum("a") > 400 && byStratum("a") < 600)
    assert(byStratum("b") > 50 && byStratum("b") < 160)
    // deterministic on re-evaluation
    assert(out.count() == Corpus.stratifiedSample(df, "stratum", "text",
      Map("a" -> 0.5, "b" -> 0.1)).count())
    // unknown stratum with defaultRate 0 drops everything
    val dropped = Corpus.stratifiedSample(
      Seq((1L, "zz", "x")).toDF("id", "stratum", "text"), "stratum", "text",
      Map("a" -> 0.5))
    assert(dropped.count() == 0)
  }

  test("topQuantileFilter keeps exactly the top scores (exact and approx agree here)") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong * 10)).toDF("id", "score")
    val exact = Corpus.topQuantileFilter(df, "score", 0.8)
    // 80th percentile of 10..1000 interpolates inside (802, 810) -> ids 81..100
    assert(exact.select("id").collect().map(_.getLong(0)).sorted.toSeq == (81L to 100L))
    val approx = Corpus.topQuantileFilter(df, "score", 0.8, approxThreshold = true)
    assert(approx.count() >= 20 && approx.count() <= 21) // sketch may include the boundary row
  }

  test("packSequences: concat-and-chunk offsets, straddling doc overflows, buckets independent") {
    val df = Seq(
      // bucket 0: token counts 100, 100, 100 -> third doc straddles the 256 cut
      (1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 100L), (4L, 0L, 100L),
      // bucket 1: starts fresh at pack 0
      (5L, 1L, 300L), (6L, 1L, 10L)
    ).toDF("id", "bucket", "n")
    val out = Corpus.packSequences(df, "id", "n", "bucket", budget = 256)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("pack_in_bucket")),
        r.getLong(r.fieldIndex("pack_offset"))))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L),   // cum 0
      (2L, 0L, 100L), // cum 100
      (3L, 0L, 200L), // cum 200: starts in pack 0, overflows into pack 1
      (4L, 1L, 44L),  // cum 300 -> pack 1 offset 44
      (5L, 0L, 0L),   // bucket 1 independent
      (6L, 1L, 44L))) // cum 300 in bucket 1
  }

  test("contamination finds exactly the train docs sharing an n-gram with bench") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix alpha beta gamma delta suffix"), // shares 'alpha beta gamma delta'
      (2L, "beta gamma delta unrelated words here"), // only 3-gram overlap -> clean
      (3L, "completely different content entirely")
    ).toDF("doc_id", "text")
    val out = Corpus.contamination(train, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("dsirWeights actually discriminates: target-style docs in the raw " +
    "pool score higher than off-domain docs (soundness, not just parity)") {
    // two disjoint vocabularies; the target domain speaks only style A
    val styleA = "recipe flour sugar butter oven bake whisk dough cream vanilla"
    val styleB = "engine torque piston camshaft exhaust manifold gasket valve"
    val raw = Seq(
      (1L, styleA), (2L, styleA + " " + styleA), // target-like
      (3L, styleB), (4L, styleB + " " + styleB), // off-domain
      (5L, "x")                                  // too short for a bigram
    ).toDF("doc_id", "text")
    val target = Seq((100L, styleA), (101L, styleA)).toDF("doc_id", "text")
    val w = Corpus.dsirWeights(raw, target, "doc_id", "text",
        nBuckets = 1024, n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every raw doc present, gram counts right, short doc weight 0
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(w(5L) == (0L, 0L))
    // DSIR's contract is the RANKING (importance resampling needs relative
    // weights; with Laplace mass nBuckets >> corpus grams the absolute sign
    // carries no meaning). Per-gram normalized: every target-like doc must
    // rank strictly above every off-domain doc, with a wide margin.
    def perGram(id: Long): Double = w(id)._2.toDouble / w(id)._1
    val targetLike = Seq(perGram(1L), perGram(2L))
    val offDomain = Seq(perGram(3L), perGram(4L))
    assert(targetLike.min > offDomain.max,
      s"ranking must separate styles: target $targetLike vs off $offDomain")
    // seen-in-target vs unseen-in-target differs by ~ln(c_t+1) per gram —
    // demand at least ln(2)/2 micro-nats of separation to catch a future
    // coefficient bug that compresses the ratio (the round-4 MinHash lesson)
    assert(targetLike.min - offDomain.max > 1e6 * math.log(2) / 2,
      s"separation margin collapsed: target $targetLike vs off $offDomain")
  }

  test("dsirResample: Gumbel-top-k draw is deterministic, biased toward the " +
    "target domain, and never surfaces gram-less docs over real ones") {
    val styleA = "recipe flour sugar butter oven bake whisk dough cream vanilla"
    val styleB = "engine torque piston camshaft exhaust manifold gasket valve"
    val raw = ((1L to 50L).map(i => (i, s"$styleA variant $i")) ++
      ((51L to 100L).map(i => (i, s"$styleB variant $i"))) :+ (101L, "x"))
      .toDF("doc_id", "text")
    val target = Seq((500L, styleA), (501L, styleA)).toDF("doc_id", "text")
    def draw(t: Double) = Corpus.dsirResample(raw, target, "doc_id", "text",
      k = 20, temperature = t, nBuckets = 1024, n = 2)
      .select("doc_id").as[Long].collect().toSet
    val hot = draw(1.0)
    assert(hot == draw(1.0), "the draw must be deterministic")
    assert(hot.size == 20)
    // T=1: Gumbel noise (stddev ~1.28e6 micro-nats) is comparable to the
    // per-gram margin here — expect a diverse draw that still leans target
    // (measured 14/20); T=0.2 scales weights 5x over the noise and the draw
    // collapses to the exact target-domain top-k (measured 20/20). The
    // temperature knob is the point of importance RESAMPLING vs top-k.
    assert(hot.count(_ <= 50L) >= 12,
      s"expected target-domain lean at T=1, got ${hot.count(_ <= 50L)}/20")
    val cold = draw(0.2)
    assert(cold.count(_ <= 50L) == 20,
      s"cold draw must collapse to the target style, got ${cold.count(_ <= 50L)}/20")
    Seq(hot, cold).foreach(p =>
      assert(!p.contains(101L), "gram-less doc must sink below real docs"))
  }

  test("dsirScoreAgainst (packed, zero-shuffle) produces values IDENTICAL " +
    "to dsirWeights, and its corpus pass plans no exchange") {
    val raw = (1L to 40L).map(i =>
      (i, s"words w${i % 7} and w${i % 3} more w${i % 5} text")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") % 4 === 0)
    val ratios = Corpus.dsirLogRatios(raw, target, "text", "doc_id",
      nBuckets = 512, n = 2, complete = true)
    assert(ratios.count() == 512, "complete ratio table must cover every bucket")
    val scored = Corpus.dsirScoreAgainst(raw, "doc_id", "text",
      ratios.localCheckpoint(true), nBuckets = 512, n = 2)
    val viaJoin = Corpus.dsirWeights(raw, target, "doc_id", "text",
        nBuckets = 512, n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaFold = scored.select("doc_id", "n_grams", "weight_u")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaFold == viaJoin,
      "packed fold and explode+join scoring must agree exactly")
    // the scoring pass itself: packed row broadcast, no hash exchange
    // downstream of the checkpointed ratio table
    val plan = scored.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcast"), s"packed ratios must broadcast:\n$plan")
    assert(!plan.contains("exchange hashpartitioning"),
      s"packed scoring must not shuffle the corpus:\n$plan")
  }

  test("dsirWeights plan: ratio table joins by broadcast, corpus text never " +
    "rides a shuffle") {
    val raw = (1L to 30L).map(i => (i, s"some words number $i here")).toDF("doc_id", "text")
    val target = raw.limit(5)
    val out = Corpus.dsirWeights(raw, target, "doc_id", "text", nBuckets = 512, n = 2)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcast"), s"lr table must broadcast:\n$plan")
    // the shuffles carry (id, bucket)/(id, sums)/(bucket, count) — assert no
    // exchange subtree outputs the text column
    val shuffles = plan.split("exchange hashpartitioning").drop(1)
    assert(!shuffles.exists(_.take(200).contains("text")),
      s"document text must not ride a shuffle:\n$plan")
  }
}
