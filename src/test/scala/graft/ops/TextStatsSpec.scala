package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("x")).head().get(0)

  test("lmScore: add-one bigram NLL matches hand computation") {
    // corpus: bg counts (a,b):3 (b,a):1 (z,z):1; prefix a:3 b:1 z:1; V=3
    // lp(a,b) = round(ln 4 * 1e6) - round(ln 6 * 1e6) = 1386294 - 1791759
    // lp(b,a) = lp(z,z) = round(ln 2 * 1e6) - round(ln 4 * 1e6) = -693147
    val df = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "z z")
    ).toDF("doc_id", "text")
    val out = TextStats.lmScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L * 405465L + 693147L, (2L * 405465L + 693147L) / 3L),
      (2L, 1L, 405465L, 405465L),
      (3L, 1L, 693147L, 693147L)))
  }

  test("lmScoreAgainst: unseen bigram with a seen prefix still divides by c_x") {
    // model on "a b a c": bg (a,b)=1 (b,a)=1 (a,c)=1; prefix a=2 b=1; V=3
    val corpus = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val model = TextStats.lmModel(corpus, "text")
    val vocab = TextStats.lmVocabSize(corpus, "text")
    val docs = Seq(
      (10L, "a d"), // unseen bigram, SEEN prefix: -lp = round(ln(2+3)·1e6)
      (11L, "d a"), // unseen prefix:              -lp = round(ln(0+3)·1e6)
      (12L, "a b")  // seen: -lp = round(ln 5·1e6) - round(ln 2·1e6)
    ).toDF("doc_id", "text")
    val out = TextStats.lmScoreAgainst(docs, "doc_id", "text", model, vocab)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 1609438L), (11L, 1098612L), (12L, 916291L)))
  }

  test("lmScore: docs without bigram evidence are excluded") {
    val df = Seq((1L, "a b"), (2L, "solo"), (3L, "  "), (4L, "")).toDF("doc_id", "text")
    val out = TextStats.lmScore(df, "doc_id", "text").select("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("tokenCount ignores extra whitespace") {
    assert(one(TextStats.tokenCount(col("t")), "  hello   world  ") == 2)
    assert(one(TextStats.tokenCount(col("t")), "") == 0)
  }

  test("meanWordLength") {
    assert(one(TextStats.meanWordLength(col("t")), "ab cdef") == 3.0)
    assert(one(TextStats.meanWordLength(col("t")), "") == 0.0)
  }

  test("punctRatio / digitRatio") {
    assert(one(TextStats.punctRatio(col("t")), "a,b").asInstanceOf[Double] == 1.0 / 3.0)
    assert(one(TextStats.digitRatio(col("t")), "a1b2").asInstanceOf[Double] == 0.5)
  }

  test("stopwordRatio counts english stopwords") {
    assert(one(TextStats.stopwordRatio(col("t")), "the cat") == 0.5)
    assert(one(TextStats.stopwordRatio(col("t")), "zebra xylophone") == 0.0)
  }

  test("native stopword kernel agrees with the regex executable spec on " +
    "every fixture shape (consecutive stopwords, punctuation-attached " +
    "tokens, tabs, case, unicode, empty)") {
    val texts = Seq(
      "the cat is on the mat",
      "the the the",                       // consecutive stopwords
      "the, cat is. on",                   // punctuation binds -> 'the,' no hit
      "The CAT IS ON the MAT",             // case folding
      "\tthe\ncat\t is  on ",              // whitespace zoo
      "le chat est dans la maison",        // another list's words
      "héllo thé 你好 the",                 // unicode near-misses
      "", "   ", "zebra xylophone"
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    for (words <- Seq(TextStats.StopwordsEn, TextStats.StopwordsFr)) {
      val kernel = df.orderBy("i").select(
        element_at(graft.functions.text.stopword_counts(col("t"), Seq(words)), 1))
        .collect().map(_.getInt(0)).toSeq
      val regex = df.orderBy("i").select(
        TextStats.stopwordCountRegex(col("t"), words))
        .collect().map(_.getInt(0)).toSeq
      assert(kernel == regex, s"kernel vs regex diverged for $words")
    }
    // multi-list call: one tokenize, per-list counts in order
    val multi = Seq("the chat is le mat").toDF("t")
      .select(graft.functions.text.stopword_counts(col("t"),
        Seq(TextStats.StopwordsEn, TextStats.StopwordsFr)))
      .head().getSeq[Int](0)
    assert(multi == Seq(2, 1)) // en hits: the, is; fr hits: le
  }

  test("subwordCount splits letter runs, digit runs, punctuation") {
    // "don't stop123" -> don | ' | t | stop | 123 = 5
    assert(one(TextStats.subwordCount(col("t")), "don't stop123") == 5)
  }

  test("languageId picks the dominant stopword language") {
    assert(one(TextStats.languageId(col("t")),
      "the cat is on the mat and it is happy") == "en")
    assert(one(TextStats.languageId(col("t")),
      "der hund ist bei der katze und es ist gut") == "de")
    assert(one(TextStats.languageId(col("t")),
      "le chat est dans la maison avec le chien") == "fr")
    assert(one(TextStats.languageId(col("t")), "") == "unknown")
  }

  test("qualityScore stays in [0,1] and ranks natural text above garbage") {
    val natural = one(TextStats.qualityScore(col("t")),
      "The quick brown fox jumps over the lazy dog near the river bank today.")
      .asInstanceOf[Double]
    val garbage = one(TextStats.qualityScore(col("t")),
      "@@@@ ##### !!!! %%%% ^^^^ &&&& **** ((((").asInstanceOf[Double]
    assert(natural >= 0.0 && natural <= 1.0)
    assert(garbage >= 0.0 && garbage <= 1.0)
    assert(natural > garbage)
  }

  test("fingerprintDigest: identical texts same digest, different texts differ") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "unrelated text that should fingerprint differently")
    ).toDF("doc_id", "text")
    val out = TextStats.fingerprintDigest(df, "text", "fp").orderBy("doc_id").collect()
    val idx = out.head.fieldIndex("fp")
    assert(out(0).getLong(idx) == out(1).getLong(idx))
    assert(out(0).getLong(idx) != out(2).getLong(idx))
  }

  test("native winnow kernel is bit-identical to the HOF formulation") {
    // edge shapes: empty, shorter than k, == k, <= window kgrams, long text,
    // repeated content (distinct dedup), multibyte codepoints (char-addressed
    // substrings), whitespace runs (normalize), and a null
    val texts = Seq(
      "", "ab", "exactly8", "just over k", "  spaced   out\ttabs  ",
      "the quick brown fox jumps over the lazy dog and keeps running onward",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // repeated kgrams -> heavy dedup
      "héllo wörld ünïcode chäräcters 你好世界 repeated 你好",
      null
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 4), (3, 2), (5, 1), (1, 3))) {
      val native = TextStats.fingerprint(df, "text", "fp", k, w)
        .orderBy("doc_id").collect().map(r => Option(r.getSeq[Long](r.fieldIndex("fp"))))
      val hof = TextStats.fingerprintHof(df, "text", "fp", k, w)
        .orderBy("doc_id").collect().map(r => Option(r.getSeq[Long](r.fieldIndex("fp"))))
      assert(native.toSeq == hof.toSeq, s"mismatch at k=$k window=$w")
    }
  }

  test("portable winnow kernel is bit-identical to the HOF formulation with " +
    "the md5-low-60-bits hash (the DuckDB-replayable family)") {
    val md5hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val texts = Seq(
      "", "ab", "exactly8", "just over k", "  spaced   out\ttabs  ",
      "the quick brown fox jumps over the lazy dog and keeps running onward",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "héllo wörld ünïcode chäräcters 你好世界 repeated 你好",
      null
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 4), (3, 2), (5, 1), (1, 3))) {
      val native = TextStats.fingerprintPortable(df, "text", "fp", k, w)
        .orderBy("doc_id").collect().map(r => Option(r.getSeq[Long](r.fieldIndex("fp"))))
      val hof = TextStats.fingerprintHof(df, "text", "fp", k, w, md5hash)
        .orderBy("doc_id").collect().map(r => Option(r.getSeq[Long](r.fieldIndex("fp"))))
      assert(native.toSeq == hof.toSeq, s"mismatch at k=$k window=$w")
    }
  }

  test("winnow_fingerprint is SQL-registered with literal k/window") {
    graft.functions.text.register(spark)
    Seq(Tuple1("the quick brown fox jumps over the lazy dog"))
      .toDF("t").createOrReplaceTempView("wf_t")
    val viaSql = spark.sql("SELECT winnow_fingerprint(t, 8, 4) AS fp FROM wf_t")
      .head().getSeq[Long](0)
    val viaApi = spark.table("wf_t")
      .select(graft.functions.text.winnow_fingerprint(col("t"), 8, 4).as("fp"))
      .head().getSeq[Long](0)
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("tfIdf: corpus-unique terms outrank ubiquitous ones; integer rank key is exact") {
    val df = Seq(
      (1L, "common common rare"),
      (2L, "common other"),
      (3L, "common more words")
    ).toDF("doc_id", "text")
    val out = TextStats.tfIdf(df, "doc_id", "text")
    val doc1 = out.filter(col("doc_id") === 1).orderBy(col("tfidf_u").desc)
      .collect().map(r => (r.getString(r.fieldIndex("term")),
        r.getLong(r.fieldIndex("tf_cnt")), r.getLong(r.fieldIndex("df_t"))))
    // 'common' appears in every doc -> idf = ln(1) = 0 -> tfidf 0 despite tf 2
    assert(doc1.head._1 == "rare" && doc1.head._3 == 1L)
    assert(doc1.last._1 == "common" && doc1.last._2 == 2L && doc1.last._3 == 3L)
    val commonTfidf = out.filter(col("term") === "common")
      .select("tfidf_u").collect().map(_.getLong(0))
    assert(commonTfidf.forall(_ == 0L))
    // exact-integer key: tfidf_u == tf_cnt * round(ln(N/df)*1e6)
    val rare = out.filter(col("term") === "rare").head()
    assert(rare.getLong(rare.fieldIndex("tfidf_u")) ==
      math.round(math.log(3.0 / 1.0) * 1e6))
  }

  test("bm25: rarer query terms dominate, tf saturates, longer docs are " +
    "penalized; score is an exact integer sum") {
    val df = Seq(
      (1L, "rare common pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common common common common"),
      (4L, "pad pad pad pad")
    ).toDF("doc_id", "text")
    val out = TextStats.bm25(df, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("matched_terms")),
          r.getLong(r.fieldIndex("score_u")))).toMap
    assert(!out.contains(4L), "no query term -> no row")
    assert(out(1L)._1 == 2 && out(2L)._1 == 1 && out(3L)._1 == 1)
    // doc 1 holds the only 'rare' (df=1) -> outranks every common-only doc
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2,
      s"expected 1 > 3 > 2, got $out")
    // tf saturation: tf=3 must score < 3x the tf=1 weight (same doc length)
    // exact replay of doc 2's single-term score: N=4 docs, T=16 tokens,
    // df(common)=3, dl=4 -> idf_u = round(ln(5/3.5)*1e6);
    // contribution = (idf_u*22*1*16) div (10*1*16 + 3*16 + 9*4*4)
    val idfU = math.round(math.log(5.0 / 3.5) * 1e6)
    assert(out(2L)._2 == idfU * 22 * 16 / (160 + 48 + 144))
  }

  test("gopherRules: each rule fires on its crafted violation and only there") {
    val clean = ("the data and the table " * 8).trim // 40 words, all rules pass
    val docs = Seq(
      1L -> clean,
      2L -> "the and short doc",                       // word count < 8
      3L -> ("a b c d e f g h i j " * 4 + "the and"),  // mean word len < 3
      4L -> (clean + " " + "# # # # # # # # # #"),     // symbols > 10%
      5L -> (1 to 10).map(i => s"- bullet $i the and").mkString("\n"), // bullets
      6L -> (1 to 10).map(i => s"line $i the and...").mkString("\n"),  // ellipsis
      7L -> (clean + " " + (1 to 15).map(_.toString).mkString(" ")),   // digits
      8L -> ("data table row scan " * 10).trim         // no required stopwords
    ).toDF("doc_id", "text")
    val out = TextStats.gopherRules(docs, "doc_id", "text",
        minWords = 8, maxWords = 100000,
        requiredWords = Seq("the", "and", "of", "to"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, c: String) = out(id).getBoolean(out(id).fieldIndex(c))
    assert(flag(1L, "gopher_pass"), s"clean doc must pass: ${out(1L)}")
    assert(!flag(2L, "ok_word_count") && !flag(2L, "gopher_pass"))
    assert(!flag(3L, "ok_mean_word_len") && flag(3L, "ok_word_count"))
    assert(!flag(4L, "ok_symbol_ratio") && flag(4L, "ok_stopwords"))
    assert(!flag(5L, "ok_bullets") && flag(5L, "ok_symbol_ratio"))
    assert(!flag(6L, "ok_ellipsis") && flag(6L, "ok_bullets"))
    assert(!flag(7L, "ok_alpha_words") && flag(7L, "ok_mean_word_len"))
    assert(!flag(8L, "ok_stopwords") && flag(8L, "ok_alpha_words"))
    // exactly one pass: every violation doc trips at least its target rule
    assert(out.values.count(r => r.getBoolean(r.fieldIndex("gopher_pass"))) == 1)
  }

  test("invertedPostings: cap truncates postings but cf/df stay full") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "alpha gamma"))
      .toDF("doc_id", "text")
    val got = TextStats.invertedPostings(docs, "doc_id", "text", postingsCap = 2)
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("cf"), r.getAs[Long]("df"), r.getAs[String]("postings")))
      .toMap
    assert(got("alpha") == ((4L, 3L, "1,2")), "cap keeps lowest 2 of 3 docs")
    assert(got("beta") == ((1L, 1L, "1")))
    assert(got("gamma") == ((1L, 1L, "3")))
  }

  test("collocationsG2: hand-checked 2x2 log-likelihood; margins computed " +
    "before the minCount filter") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus bigrams: "a b" x3, "a c" x1, "d b" x1 -> M=5, R(a)=4, C(b)=4
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "d b")).toDF("doc_id", "text")
    val out = TextStats.collocationsG2(docs, "text", minCount = 2L, topK = 5)
      .collect()
    assert(out.length == 1) // only (a,b) reaches minCount
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getAs[Long]("c_xy") == 3L)
    def lnU(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    // O11=3 O12=1 O21=1 O22=0, M=5, R=4, C=4
    val exp = 2L * (
      3L * (lnU(3) + lnU(5) - lnU(4) - lnU(4)) +
      1L * (lnU(1) + lnU(5) - lnU(4) - lnU(1)) +
      1L * (lnU(1) + lnU(5) - lnU(1) - lnU(4)))
    assert(r.getAs[Long]("g2_u") == exp, s"got ${r.getAs[Long]("g2_u")} want $exp")
    // margins unaffected by minCount: raising minCount can drop ROWS but
    // never change a surviving row's g2_u
    val loose = TextStats.collocationsG2(docs, "text", minCount = 1L, topK = 5)
      .filter(col("w1") === "a" && col("w2") === "b").collect().head
    assert(loose.getAs[Long]("g2_u") == exp)
  }

  test("textrank: the hub word adjacent to every other word ranks first; " +
    "graph is undirected and deduplicated") {
    import spark.implicits._
    // star graph around "hub": hub-a, hub-b, hub-c, hub-d (+ a-b once);
    // repeating "hub a" must not change ranks (distinct edges)
    val docs = Seq((1L, "hub a"), (2L, "hub b"), (3L, "hub c"),
      (4L, "hub d"), (5L, "a b"), (6L, "hub a"), (7L, "hub a"))
      .toDF("doc_id", "text")
    val out = TextStats.textrank(docs, "text", iters = 3, topK = 10).collect()
    assert(out.head.getString(0) == "hub",
      s"hub must out-rank leaves: ${out.map(r => (r.getString(0), r.getLong(1))).toSeq}")
    // undirected: "hub a" edges give 'a' rank even though 'a' is never a
    // bigram SOURCE toward hub in half the docs; all 5 words present
    assert(out.map(_.getString(0)).toSet == Set("hub", "a", "b", "c", "d"))
    // dedup: identical corpus without the repeats ranks identically
    val dedup = TextStats.textrank(docs.filter($"doc_id" <= 5L), "text",
      iters = 3, topK = 10).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      dedup.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("rakeKeywords: hand-computed deg/freq scores; phrases split on " +
    "stopwords; multi-word phrase out-ranks its members") {
    import spark.implicits._
    // doc1: [deep learning] the [deep model]; doc2: [deep learning]
    val docs = Seq((1L, "deep learning the deep model"),
      (2L, "deep learning")).toDF("doc_id", "text")
    val out = TextStats.rakeKeywords(docs, "doc_id", "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_occurrences"), r.getAs[Long]("score_u"))).toMap
    // phrases: "deep learning" x2 (len 2), "deep model" x1 (len 2)
    // deg(deep)=2+2+2=6 freq=3 -> 2e6; deg(learning)=4 freq=2 -> 2e6;
    // deg(model)=2 freq=1 -> 2e6
    assert(out.keySet == Set("deep learning", "deep model"))
    assert(out("deep learning") == ((2L, 4000000L)), s"got $out")
    assert(out("deep model") == ((1L, 4000000L)))
    // the multi-word phrase beats any single word's score by construction
    val single = TextStats.rakeKeywords(
      Seq((1L, "alpha the alpha beta")).toDF("doc_id", "text"), "doc_id",
      "text", topK = 10).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("score_u")).toMap
    // phrases: [alpha] (len1), [alpha beta] (len2):
    // deg(alpha)=1+2=3 freq=2 -> 1.5e6; deg(beta)=2 freq=1 -> 2e6
    assert(single("alpha beta") == 3500000L && single("alpha") == 1500000L)
  }
}
