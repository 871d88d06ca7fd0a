package graft

import graft.ops.{Corpus, Similarity, TextStats}
import org.apache.spark.sql.functions._

class CorpusExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("lmScore: gibberish scores higher NLL than corpus-typical text") {
    val common = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val df = (common :+ ((21L, "zq xv qqk wmt zzj plf"))).toDF("doc_id", "text")
    val out = TextStats.lmScore(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val worstCommon = out.filter(_._1 <= 20L).map(_._4).max
    val gibberish = out.find(_._1 == 21L).get
    assert(gibberish._4 > worstCommon,
      s"gibberish avg NLL ${gibberish._4} must exceed typical $worstCommon")
    // bigram evidence: 6 tokens -> 5 bigrams; NLL positive; avg <= total
    assert(gibberish._2 == 5L)
    assert(out.forall(_._3 > 0L))
    assert(out.forall(t => t._4 <= t._3))
  }

  test("chunkTokens tiles [1, n] for any doc length: no gaps, full tail") {
    for (n <- Seq(1, 5, 24, 25, 32, 33, 70, 100)) {
      val df = Seq((1L, (1 to n).map("t" + _).mkString(" "))).toDF("doc_id", "text")
      val rows = Corpus.chunkTokens(df, "doc_id", "text", chunkSize = 32, stride = 24)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getLong(2), r.getLong(3))) // (start_tok, n_tokens)
      assert(rows.head._1 == 1L)
      rows.sliding(2).foreach {
        case Array((s1, k1), (s2, _)) =>
          assert(s2 - s1 == 24L, s"n=$n starts must step by stride")
          assert(s2 <= s1 + k1, s"n=$n consecutive chunks must not leave a gap")
        case _ => ()
      }
      assert(rows.last._1 + rows.last._2 - 1 == n.toLong, s"n=$n tail must be covered")
    }
  }

  test("pmiBigrams scores an always-adjacent pair above an independent one") {
    // "x y" always adjacent; "a"/"b" co-occur never
    val docs = Seq.fill(10)("x y a").zipWithIndex
      .map { case (t, i) => (i.toLong, if (i % 2 == 0) t else "x y b") }
      .toDF("doc_id", "text")
    val out = TextStats.pmiBigrams(docs, "text", minCount = 2L)
      .collect().map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("c_xy"), r.getAs[Double]("pmi")))).toMap
    assert(out.contains(("x", "y")) && out(("x", "y"))._1 == 10L)
    // P(x,y)=10/20 bigrams, P(x)=P(y)=10/30 unigrams:
    // pmi = ln(0.5 / (1/3 * 1/3)) = ln(4.5)
    assert(math.abs(out(("x", "y"))._2 - math.log(4.5)) < 1e-5)
    // y->a happens 5 times: pmi = ln((5/20)/((10/30)*(5/30))) = ln(4.5)
    // all observed pairs are fully predictable here; check a minCount drop
    assert(!out.contains(("a", "x")), "cross-doc pair must not exist")
  }

  test("pmiBigrams minCount filters rare pairs") {
    val docs = Seq((1L, "p q p q r s")).toDF("doc_id", "text")
    val out = TextStats.pmiBigrams(docs, "text", minCount = 2L)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(out == Set(("p", "q"))) // only p->q occurs twice
  }

  test("mixtureSample equalizes sources at alpha=0 and keeps proportions at alpha=1") {
    val docs = (0 until 900).map { i =>
      val src = if (i < 800) "big" else "small"
      (i.toLong, src, s"doc body $i")
    }.toDF("doc_id", "source", "text")
    // alpha=0: w_s = 1/2 each; f=0.25 of 900 = 225 target, 112.5 per source;
    // small (100 rows) saturates at keep=1.0, big keeps ~112.5/800 = 14%
    val eq = Corpus.mixtureSample(docs, "source", "text", alpha = 0.0,
      targetFraction = 0.25)
    val bySrc = eq.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("small") == 100L, "under-represented source saturates at keep=1")
    assert(bySrc("big") < 200L, s"big source must be heavily downsampled, got ${bySrc("big")}")
    // alpha=1: keep rate = f for every source (natural proportions)
    val nat = Corpus.mixtureSample(docs, "source", "text", alpha = 1.0,
      targetFraction = 0.25)
    val natBySrc = nat.groupBy("source").count().as[(String, Long)].collect().toMap
    val bigRate = natBySrc("big").toDouble / 800
    assert(math.abs(bigRate - 0.25) < 0.08, s"alpha=1 keeps ~f per source, got $bigRate")
  }

  test("mixtureSample is deterministic and content-keyed") {
    val docs = Seq((1L, "s", "same text"), (2L, "s", "same text"),
      (3L, "s", "other")).toDF("doc_id", "source", "text")
    val a = Corpus.mixtureSample(docs, "source", "text", 0.5, 0.5)
      .select("doc_id").as[Long].collect().toSet
    val b = Corpus.mixtureSample(docs, "source", "text", 0.5, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // exact duplicates sample identically
    assert(a.contains(1L) == a.contains(2L))
  }

  test("pqCodes: a codebook vector encodes to itself with zero distance") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => (i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(vecs, "vec_id", "embedding", dim = 8, m = 2, k = 4)
      .orderBy("id", "sub").collect()
    assert(out.length == 40) // 20 vectors x 2 subspaces
    // vectors 0..3 are the codebook: each must pick itself at dist 0
    out.filter(_.getAs[Long]("id") < 4).foreach { r =>
      assert(r.getAs[Int]("code").toLong == r.getAs[Long]("id"))
      assert(r.getAs[Double]("dist") == 0.0)
    }
    // every other vector picks the L2-nearest codebook entry (here: cid 3,
    // the largest, since values grow with id)
    out.filter(_.getAs[Long]("id") >= 4).foreach { r =>
      assert(r.getAs[Int]("code") == 3)
    }
  }

  test("pqCodes ties break to the lowest centroid id") {
    // two identical codebook vectors -> both at dist 0, lowest cid wins
    val vecs = Seq(
      (0L, Array(1f, 1f)), (1L, Array(1f, 1f)), (2L, Array(5f, 5f)),
      (3L, Array(1f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(vecs, "vec_id", "embedding", dim = 2, m = 1, k = 3)
      .filter(col("id") === 3L).collect()
    assert(out.head.getAs[Int]("code") == 0)
  }

  test("tokenEntropy: uniform tokens give ln(k), repeated token gives 0") {
    val docs = Seq(
      (1L, "a b c d"),      // 4 distinct -> ln(4)
      (2L, "x x x x"),      // 1 distinct -> 0
      (3L, "a a b b")       // 2 classes of 2: ln(4) - (1/4)(2ln2+2ln2) = ln2
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_tokens", "entropy").as[(Long, Double)].collect()
    assert(out(0)._1 == 4L && math.abs(out(0)._2 - math.log(4)) < 1e-5)
    assert(out(1)._2 == 0.0)
    assert(math.abs(out(2)._2 - math.log(2)) < 1e-5)
  }

  test("dupNgramStats counts cross-doc shared distinct n-grams exactly") {
    val docs = Seq(
      (1L, "one two three four five six"),   // 2 distinct 5-grams
      (2L, "one two three four five seven"), // shares "one two three four five"
      (3L, "totally different text goes here now"),
      (4L, "short doc")                      // < 5 tokens -> absent
    ).toDF("doc_id", "text")
    val out = graft.ops.Corpus.dupNgramStats(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_ngrams", "n_dup", "dup_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // doc 4 has no 5-grams
    assert(out(0) == ((1L, 2L, 1L, 500000L)))      // 1 of 2 grams shared
    assert(out(1) == ((2L, 2L, 1L, 500000L)))
    assert(out(2) == ((3L, 2L, 0L, 0L)))
  }

  test("dupNgramStats: within-doc repetition does not count as duplication") {
    val docs = Seq((1L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val out = graft.ops.Corpus.dupNgramStats(docs, "doc_id", "text", n = 5)
      .select("n_dup").as[Long].collect()
    assert(out.toSeq == Seq(0L)) // distinct-per-doc first: own repeats don't inflate df
  }

  test("zipfSlope recovers the exponent of a synthetic power-law corpus") {
    // word w_r appears floor(1000 / r) times: exact Zipf with slope -1
    val words = (1 to 20).flatMap { r => Seq.fill(1000 / r)(f"w$r%02d") }
    val docs = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val out = graft.ops.TextStats.zipfSlope(docs, "text", topK = 20, minCount = 1L)
      .select("n_words", "zipf_slope").as[(Long, Double)].head()
    assert(out._1 == 20L)
    assert(math.abs(out._2 - (-1.0)) < 0.02, s"slope ${out._2} should be ~ -1")
  }

  test("capPerSource keeps exactly cap rows per source, deterministically") {
    val df = (1 to 50).map(i => (i.toLong, "src" + (i % 5), "t" + i))
      .toDF("doc_id", "source", "text")
    val out = Corpus.capPerSource(df, "doc_id", "source", 3)
    val cnt = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnt.size == 5 && cnt.values.forall(_ == 3L))
    // text column survives the semi-join (full rows come back)
    assert(out.columns.toSeq == Seq("doc_id", "source", "text"))
    // cap >= group size keeps everything
    assert(Corpus.capPerSource(df, "doc_id", "source", 100).count() == 50)
    // deterministic across runs
    val a = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Corpus.capPerSource(df, "doc_id", "source", 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("pqCodebook slices subspaces contiguously") {
    val vecs = Seq((0L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 1)
      .orderBy("sub").collect()
    assert(cb.map(_.getAs[scala.collection.Seq[Double]]("cv").toSeq).toSeq ==
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
  }

  test("canonicalizeUrl: every normalization step, individually pinned") {
    def canon(u: String): String =
      Seq(Tuple1(u)).toDF("u")
        .select(Corpus.canonicalizeUrl(col("u"))).collect()(0).getString(0)
    // scheme+host lowercased, path case preserved
    assert(canon("HTTPS://ExAmPlE.com/KeepCase") == "https://example.com/KeepCase")
    // default ports dropped — but only the matching scheme's
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")
    // www. label, fragment, trailing slashes, empty path
    assert(canon("https://www.a.com/") == "https://a.com/")
    assert(canon("https://a.com/p/#frag") == "https://a.com/p")
    assert(canon("https://a.com") == "https://a.com/")
    // tracking params dropped, survivors sorted, empty params dropped
    assert(canon("https://a.com/p?utm_source=x&b=2&a=1&gclid=g&fbclid=f&ref=r")
      == "https://a.com/p?a=1&b=2")
    assert(canon("https://a.com/p?b=2&a=1") == canon("https://a.com/p?a=1&b=2"))
    assert(canon("https://a.com/p?utm_campaign=c") == "https://a.com/p")
    // a param merely CONTAINING 'ref' is kept (prefix match on the name)
    assert(canon("https://a.com/p?preference=1") == "https://a.com/p?preference=1")
    // the canonical of a canonical is itself (idempotence)
    val once = canon("HTTP://WWW.A.com:80/x/?b=2&a=1#z")
    assert(canon(once) == once, s"not idempotent: $once -> ${canon(once)}")
  }

  test("htmlToText: container removal, entity decode order, whitespace") {
    def x(h: String): String =
      Seq(Tuple1(h)).toDF("h")
        .select(Corpus.htmlToText(col("h"))).collect()(0).getString(0)
    assert(x("<p>a</p><script>var b = 'hidden';</script><p>c</p>") == "a c")
    assert(x("<style>p{}</style><nav>menu</nav>body") == "body")
    assert(x("<!-- <p>not text</p> -->real") == "real")
    // multi-line script bodies die too ((?s) dotall)
    assert(x("<script>\nline1\nline2\n</script>ok") == "ok")
    // tags become spaces so block boundaries don't glue words
    assert(x("<p>one</p><p>two</p>") == "one two")
    // &amp; decodes LAST: '&amp;lt;' is the literal string '&lt;'
    assert(x("Fish &amp; Chips &lt;b&gt; &quot;q&quot; &#39;s&#39; &amp;lt;")
      == "Fish & Chips <b> \"q\" 's' &lt;")
    assert(x("  a \n\n b\t c  ") == "a b c")
  }
}
