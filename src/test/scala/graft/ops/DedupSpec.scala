package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("sharedSpanPairs finds the planted span with its exact length") {
    // docs 1 and 2 share exactly tokens s1..s20 (a 20-token span); doc 3
    // is unrelated; doc 4 shares only a 7-token span with doc 1 — below
    // k=8, so no anchor can even form for it
    val span = (1 to 20).map("s" + _).mkString(" ")
    val short = (1 to 7).map("s" + _).mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"one two three $span four"),
      (3L, "completely different words everywhere here now and forever more"),
      (4L, s"prefix tokens then $short and unrelated tail stuff")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpanPairs(docs, "doc_id", "text",
        k = 8, minSpan = 10, maxBucketSize = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set((1L, 2L)))
    // a 20-token shared span yields 20-8+1 = 13 consecutive anchors
    assert(out((1L, 2L)) == ((13L, 20L)))
  }

  test("scrubSharedSpans cuts the span from the LATER doc only, leaves " +
    "the earlier doc and bystanders whole, and rebuilds the remainder") {
    val span = (1 to 20).map("s" + _).mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"one two three $span four"),
      (3L, "completely different words everywhere here now")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubSharedSpans(docs, "doc_id", "text",
        k = 8, minSpan = 10, maxBucketSize = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 (the earlier of the pair) keeps everything
    assert(out(1L) == ((24, 0L, s"alpha beta $span gamma delta")))
    // doc 2 loses exactly the 20 planted tokens
    assert(out(2L) == ((24, 20L, "one two three four")))
    assert(out(3L)._2 == 0L)
  }

  test("scrubSharedSpans merges overlapping cuts from different pairs") {
    // doc 30 shares tokens 1..14 with doc 10 and tokens 8..21 with doc 20:
    // the two cuts overlap and must merge into one 21-token removal
    val s = (1 to 21).map("s" + _)
    val docs = Seq(
      (10L, s.slice(0, 14).mkString(" ")),
      (20L, s.slice(7, 21).mkString(" ")),
      (30L, s.mkString(" ") + " tail1 tail2")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubSharedSpans(docs, "doc_id", "text",
        k = 8, minSpan = 10, maxBucketSize = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out(30L) == ((21L, "tail1 tail2")), out(30L).toString)
    assert(out(10L)._1 == 0L && out(20L)._1 == 0L)
  }

  test("ngramContainment: a snippet fully inside a larger doc scores 1e6 " +
    "ppm where Jaccard dilutes") {
    val snippet = (1 to 10).map("w" + _).mkString(" ")
    val docs = Seq(
      (1L, snippet),
      (2L, s"$snippet ${(1 to 40).map("x" + _).mkString(" ")}")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.ngramContainment(docs, pairs, "doc_id", "text", n = 3).head()
    // all 8 trigrams of the snippet appear in doc 2
    assert(r.getLong(r.fieldIndex("n_inter")) == 8)
    assert(r.getLong(r.fieldIndex("n_small")) == 8)
    assert(r.getLong(r.fieldIndex("containment_ppm")) == 1000000L)
  }

  test("sharedSpanPairs: repeated boilerplate above the bucket cap is ignored") {
    val boiler = (1 to 12).map("b" + _).mkString(" ")
    val docs = (1L to 9L).map(i => (i, s"doc $i says $boiler end$i")).toDF("doc_id", "text")
    // 9 docs × 5 anchor positions of the boilerplate = every anchor bucket
    // holds 9 entries; cap at 8 kills them all
    val capped = Dedup.sharedSpanPairs(docs, "doc_id", "text",
      k = 8, minSpan = 8, maxBucketSize = 8)
    assert(capped.count() == 0)
    // with a generous cap the same pairs appear
    val open = Dedup.sharedSpanPairs(docs, "doc_id", "text",
      k = 8, minSpan = 8, maxBucketSize = 100)
    assert(open.count() == 36) // all C(9,2) pairs share the span
  }

  test("exact dedup groups normalized duplicates, keeps smallest id") {
    val docs = Seq(
      (1L, "Hello   World"),
      (2L, "  hello world "),
      (3L, "something else")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(out(0).fieldIndex("keep_id")) == 1L)
    assert(out(0).getLong(out(0).fieldIndex("group_size")) == 2L)
    assert(out(1).getLong(out(1).fieldIndex("group_size")) == 1L)
  }

  test("shingles produce word n-grams; short texts collapse to one shingle") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(Dedup.shingles(col("text"), 3).as("sh")).collect()
    assert(out(0).getSeq[String](0).toSet == Set("a b c", "b c d"))
    assert(out(1).getSeq[String](0) == Seq("a b"))
  }

  test("incrementalExact drops known content and in-batch dups, keeps new content") {
    val known = Seq((1L, "existing document one"), (2L, "existing document two"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "Existing   document one"), // dup of known (normalization-invariant)
      (11L, "fresh content a"),
      (12L, "fresh content a"),         // in-batch dup -> keep 11 only
      (13L, "fresh content b")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExact(incoming, known, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(11L, 13L))
  }

  test("incrementalNearDup drops incoming docs near-identical to the corpus") {
    val known = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different known content about other things entirely here"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      // near-identical to known doc 1 (one token changed)
      (10L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (11L, "fresh incoming material sharing nothing with the standing corpus at all"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(incoming, known, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(11L))
  }

  test("native minhash kernel is bit-identical to the declarative explode+agg form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  Leading and   trailing   whitespace  "),
      (3L, ""), (4L, "   "), (5L, "one"), (6L, "two words"),
      (7L, "Ärger über große Straßen in München"), // unicode lowercase path
      (8L, "repeat repeat repeat repeat repeat"),   // duplicate shingles
      (9L, "café naïve séance déjà vu encore une fois"),
      (10L, "a\tb\nc d   e f g h")                  // mixed whitespace
    ).toDF("doc_id", "text")
    for ((n, k) <- Seq((3, 32), (2, 8), (5, 16))) {
      val native = Dedup.signatures(docs, "doc_id", "text", n, k)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      val agg = Dedup.signaturesAgg(docs, "doc_id", "text", n, k)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      assert(native.toSeq == agg.toSeq, s"mismatch at shingle=$n hashes=$k")
    }
    // null text DROPS in both forms (no (id, null) row from the kernel)
    val withNull = Seq((1L, Some("real text here")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    assert(Dedup.signatures(withNull, "doc_id", "text", 3, 8).count() == 1)
    assert(Dedup.signaturesAgg(withNull, "doc_id", "text", 3, 8).count() == 1)
  }

  test("native simhash kernel is bit-identical to the lane-packed aggregate form") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "  spaced   out  tokens  "),
      (3L, "Ärger über Straßen"), (4L, "x"),
      (5L, "many many many repeated tokens many more")
    ).toDF("doc_id", "text")
    val native = Dedup.withSimhash(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val agg = Dedup.withSimhashAgg(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(native.toSeq == agg.toSeq)
    // tokenless docs drop in BOTH forms — including tab/newline-only text
    // (SQL trim strips only ASCII space, so a trim-based filter missed it)
    val empty = Seq((9L, "   "), (10L, "\t\n"), (11L, "\t")).toDF("doc_id", "text")
    assert(Dedup.withSimhash(empty, "doc_id", "text").count() == 0)
    assert(Dedup.withSimhashAgg(empty, "doc_id", "text").count() == 0)
  }

  test("token_ngrams kernel matches the HOF shingle forms") {
    import graft.functions.minhash.token_ngrams
    val df = Seq((1L, "The Quick Brown fox"), (2L, "tiny"), (3L, "a b a b a b"))
      .toDF("doc_id", "text")
    // lowercase+collapse matches Dedup.shinglesFromTokens(tokens(text))
    val viaKernel = df.select(col("doc_id"),
      token_ngrams(col("text"), 3, collapseShort = true).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    val viaHof = df.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(viaKernel.toSeq == viaHof.toSeq)
    // case-preserving, no-collapse keeps original casing and drops short docs
    val cased = df.select(token_ngrams(col("text"), 3,
      collapseShort = false, lowercase = false).as("g"))
      .orderBy("g").collect().map(_.getSeq[String](0))
    assert(cased.exists(_.contains("The Quick Brown")))
    assert(cased.exists(_.isEmpty))
  }

  test("minhash_signature is SQL-registered") {
    graft.functions.minhash.register(spark)
    Seq(Tuple1("some text to sketch right here")).toDF("t")
      .createOrReplaceTempView("mh_t")
    val viaSql = spark.sql("SELECT minhash_signature(t, 3, 8) AS s FROM mh_t")
      .head().getSeq[Long](0)
    val viaApi = spark.table("mh_t")
      .select(graft.functions.minhash.minhash_signature(col("t"), 3, 8).as("s"))
      .head().getSeq[Long](0)
    assert(viaSql == viaApi && viaSql.length == 8)
  }

  test("minhash signatures: identical docs get identical signatures") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with no overlap whatsoever here now")
    ).toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 3, 16)
      .orderBy("doc_id").collect()
    assert(sigs(0).getSeq[Long](1) == sigs(1).getSeq[Long](1))
    assert(sigs(0).getSeq[Long](1) != sigs(2).getSeq[Long](1))
    assert(sigs(0).getSeq[Long](1).length == 16)
  }

  test("minhash LSH finds duplicate pair with est_jaccard 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with no overlap whatsoever here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("ngramJaccard computes exact set Jaccard on candidate pairs") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(docs, pairs, "doc_id", "text", n = 3).collect()
    // shingles: {a b c, b c d} vs {a b c, b c e} -> 1 common / 3 union
    assert(math.abs(out.head.getDouble(out.head.fieldIndex("jaccard")) - 1.0 / 3.0) < 1e-12)
  }

  test("simhash: identical docs -> identical fingerprints, hamming 0 candidates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely unrelated words describing other things completely")
    ).toDF("doc_id", "text")
    val fps = Dedup.withSimhash(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(fps(0).getLong(1) == fps(1).getLong(1))
    val pairs = Dedup.simhashCandidatePairs(docs, "doc_id", "text").collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getInt(r.fieldIndex("hamming")) == 0))
  }

  test("nearDupClusters labels duplicates together, singletons by themselves") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with no overlap whatsoever here now")
    ).toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  test("nearDupClusters on all-unique corpus: every doc is its own cluster") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(docs, "doc_id", "text").collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("components: chained pairs collapse to one min-label component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val labels = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(7L) == 7L && labels(8L) == 7L)
  }

  test("componentsWithConvergence surfaces the maxIter guard instead of " +
    "silently returning under-merged labels") {
    // a 10-node chain needs ~log2(9) propagation rounds; maxIter=2 allows one.
    // driverMaxEdges = 0 forces the DISTRIBUTED path: the maxIter guard is a
    // propagation-loop contract, and the driver union-find (which any graph
    // this small would otherwise take) is exact in one pass, so its flag is
    // true by construction — asserted separately below.
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, ok) = Dedup.componentsWithConvergence(chain, driverMaxEdges = 0)
    assert(ok, "default maxIter must converge on a 10-node chain")
    assert(labels.select("label").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // the contraction build closes a bare chain in ONE level (pointer
    // collapse is exponential in chain depth), so forcing under-merge
    // needs a graph whose level-1 contraction leaves edges behind: an
    // alternating-id path (1,100,2,200,…) contracts to the consecutive
    // path 1-2-…, which needs a second level — maxIter=1 must surface
    // the guard instead of silently returning the five split hubs.
    val nodes = Seq(1L, 100L, 2L, 200L, 3L, 300L, 4L, 400L, 5L)
    val alt = nodes.zip(nodes.tail).toDF("id_a", "id_b")
    val (altLabels, early) =
      Dedup.componentsWithConvergence(alt, maxIter = 1, driverMaxEdges = 0)
    assert(!early, "one level cannot close the alternating-id path; flag must say so")
    assert(altLabels.select("label").distinct().count() > 1,
      "under-merged labels are exactly what the false flag reports")
    // driver union-find path: labels exact and flag true even under a
    // maxIter the propagation loop could not satisfy — the flag means
    // "labels are trustworthy", and union-find labels always are
    val (ufLabels, ufOk) = Dedup.componentsWithConvergence(chain, maxIter = 2)
    assert(ufOk, "union-find labels are exact; flag must say trustworthy")
    assert(ufLabels.select("label").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // empty graph: trivially converged
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.componentsWithConvergence(empty)._2)
  }

  test("componentsWithConvergence rejects non-integral id columns loudly " +
    "instead of null-collapsing them into one component") {
    val strPairs = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val err = intercept[IllegalArgumentException] {
      Dedup.componentsWithConvergence(strPairs)
    }
    assert(err.getMessage.contains("integral id columns"))
    assert(err.getMessage.contains("portableHash64"))
  }

  test("components: a 100-node path (the ridge-diameter shape) converges " +
    "within the default round budget to a single min label") {
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, ok) = Dedup.componentsWithConvergence(chain)
    assert(ok, "path-100 must converge inside the default maxIter")
    val collected = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(collected.length == 100)
    assert(collected.forall(_._2 == 1L),
      s"all nodes label 1, got ${collected.filter(_._2 != 1L).take(5).toSeq}")
  }

  test("components: adversarial chain shapes converge within the level " +
    "budget (contraction semantics, not edge-hop rounds)") {
    // The two pathologies that defeat each HALF of the contraction build
    // alone — both overran a per-edge-hop round budget at the 30x scale
    // probe (ScaleSelfCheck split_core_edges, round 9):
    // (a) consecutive DESCENDING ids: one deep pointer chain — contraction
    //     without the collapse-to-idempotence inner loop shrinks it by
    //     only 2^cap nodes per level;
    val desc = (1L until 600L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val (l1, ok1) = Dedup.componentsWithConvergence(desc, driverMaxEdges = 0)
    assert(ok1, "descending-id 600-chain must converge (distributed path)")
    assert(l1.select("label").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // (b) random-id path: pointers flatten onto LOCAL minima (fixed points
    //     of any pointer chase), so min-label propagation without
    //     contraction moves one edge per round — O(diameter) rounds.
    val rnd = new scala.util.Random(11)
    val perm = rnd.shuffle((0L until 600L).toVector)
    val path = (0 until 599).map(i => (perm(i), perm(i + 1)))
      .toDF("id_a", "id_b")
    val (l2, ok2) = Dedup.componentsWithConvergence(path, driverMaxEdges = 0)
    assert(ok2, "random-id 600-path must converge (distributed path)")
    assert(l2.select("label").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("setSimilarityJoin (prefix-filtered) == brute force on overlapping docs") {
    // sliding windows over a shared vocab: adjacent docs share most of
    // their trigram sets, distant docs share none — pairs land on both
    // sides of the threshold, which is what makes prefix-pruning bugs
    // visible (a dropped candidate changes the output set)
    val base = (1 to 60).map("w" + _)
    val docs = (0 until 30).map { i =>
      (i.toLong, base.slice(i % 20, i % 20 + 12 + (i % 3)).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.setSimilarityJoin(docs, "doc_id", "text",
        n = 3, thetaPpm = 600000L)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val brute = Dedup.setSimilarityJoinBrute(docs, "doc_id", "text",
        n = 3, thetaPpm = 600000L)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(fast.nonEmpty, "fixture must produce qualifying pairs")
    assert(fast.size < 30 * 29 / 2, "fixture must also reject pairs")
    assert(fast == brute)
  }

  test("setSimilarityJoin plan: equi-joins only (no cartesian), text never " +
    "rides a shuffle") {
    val docs = (0 until 20).map { i =>
      (i.toLong, (1 to 10).map(j => "w" + ((i + j) % 15)).mkString(" "))
    }.toDF("doc_id", "text")
    val out = Dedup.setSimilarityJoin(docs, "doc_id", "text",
      n = 3, thetaPpm = 500000L)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("cartesianproduct") && !plan.contains("nestedloop"),
      s"prefix filtering must never plan an all-pairs join:\n$plan")
    val shuffles = plan.split("exchange hashpartitioning").drop(1)
    assert(!shuffles.exists(_.take(200).contains("text")),
      s"document text must not ride a shuffle:\n$plan")
  }

  test("setSimilarityJoin threshold is inclusive (>=) at an exact boundary") {
    // A: {abc,bcd,cde,def}, B: {xbc,bcd,cde,def} -> inter 3, union 5,
    // jaccard exactly 0.6
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x b c d e f")
    ).toDF("doc_id", "text")
    val atTheta = Dedup.setSimilarityJoin(docs, "doc_id", "text",
      n = 3, thetaPpm = 600000L).collect()
    assert(atTheta.length == 1)
    assert(atTheta.head.getAs[Long]("jaccard_ppm") == 600000L)
    val above = Dedup.setSimilarityJoin(docs, "doc_id", "text",
      n = 3, thetaPpm = 600001L).collect()
    assert(above.isEmpty)
  }
}
