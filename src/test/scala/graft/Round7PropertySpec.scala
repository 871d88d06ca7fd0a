package graft

import graft.ops.{Corpus, Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven invariants for the round-7 hardening (the
  * [[Round5PropertySpec]] convention: fixed seeds, few heavy trials).
  */
class Round7PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int = 6): Seq[T] =
    (1 to n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  // ==== components: exact driver union-find == converged propagation ====

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 40)
    nEdges <- Gen.choose(0, 60)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong)
      b <- Gen.choose(0L, nNodes.toLong)
    } yield (a, b))
  } yield edges.filter { case (a, b) => a != b }

  test("property: driver union-find labels == converged distributed " +
    "min-label propagation labels on random graphs") {
    for (edges <- cases(graphGen, 8) if edges.nonEmpty) {
      val pairs = edges.toDF("id_a", "id_b")
      // driverMaxEdges large -> exact union-find on the driver
      val (uf, ufOk) =
        Dedup.componentsWithConvergence(pairs, driverMaxEdges = Long.MaxValue)
      // driverMaxEdges = 0 -> the distributed propagation loop, default
      // maxIter (converges: diameter <= 40 closes in <= 16 doubling rounds)
      val (prop, propOk) =
        Dedup.componentsWithConvergence(pairs, driverMaxEdges = 0)
      assert(ufOk && propOk)
      val ufM = uf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val propM = prop.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ufM == propM,
        s"union-find and propagation disagree on $edges:\n$ufM\nvs\n$propM")
      // both are "min node id per component": every label is a member of
      // its own component and is <= every node it labels
      ufM.foreach { case (id, lbl) =>
        assert(lbl <= id && ufM(lbl) == lbl, s"label $lbl of $id not a root")
      }
    }
  }

  // ==== percent_normalize: kernel == independent scalar model ====

  /** Independent test-side model of RFC 3986 §6.2.2 (written against the
    * RFC, not the kernel): decode unreserved, uppercase surviving escapes,
    * copy malformed '%' verbatim.
    */
  private def percentRef(s: String): String = {
    def hv(c: Char): Int = Character.digit(c, 16)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '%' && i + 2 < s.length && hv(s(i + 1)) >= 0 && hv(s(i + 2)) >= 0) {
        val v = hv(s(i + 1)) * 16 + hv(s(i + 2))
        val unres = (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
          (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'
        if (unres) sb.append(v.toChar) else sb.append(f"%%$v%02X")
        i += 3
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  private val pctGen: Gen[String] = Gen.listOfN(24, Gen.frequency(
    4 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.oneOf("%41", "%7e", "%7E", "%2f", "%2F", "%3A", "%zz", "%4", "%",
      "%25", "%20", "%5f", "%2e"),
    1 -> Gen.oneOf("/", ":", "?", "&", "=", ".", "~", "-"))).map(_.mkString)

  test("property: percent_normalize == RFC model, idempotent, and " +
    "verbatim on malformed escapes") {
    val inputs = cases(pctGen, 40)
    def norm(us: Seq[String]): Seq[String] =
      us.toDF("u")
        .select(graft.functions.text.percent_normalize(col("u")).as("c"))
        .collect().map(_.getString(0)).toSeq
    val once = norm(inputs)
    inputs.zip(once).foreach { case (in, out) =>
      assert(out == percentRef(in), s"kernel vs model on $in")
    }
    assert(norm(once) == once, "not idempotent")
    // the pinned crawl-miss classes
    assert(norm(Seq("%7Euser")) == Seq("~user"))
    assert(norm(Seq("x%2fy%41")) == Seq("x%2FyA"))
    assert(norm(Seq("a%zz%4")) == Seq("a%zz%4")) // malformed untouched
    assert(norm(Seq("%2541")) == Seq("%2541")) // %25='%' is reserved: kept
  }

  // ==== canonicalizeUrl: unparseable passthrough ====

  test("property: canonicalizeUrl passes inputs with no scheme://authority " +
    "through unchanged (no shared canonical key for garbage)") {
    val junkGen: Gen[String] = Gen.oneOf(
      Gen.alphaStr.map(s => s"relative/${s.take(8)}"),
      Gen.alphaStr.map(s => s"//host.com/${s.take(6)}"), // protocol-relative
      Gen.alphaStr.map(s => s"mailto:${s.take(6)}@x.io"),
      Gen.alphaStr.map(_.take(12)),
      Gen.const("not a url at all"))
    val junk = cases(junkGen, 30).filter(_.nonEmpty)
    val out = junk.toDF("u")
      .select(Corpus.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    junk.zip(out).foreach { case (in, o) =>
      assert(o == in, s"unparseable input rewritten: $in -> $o")
    }
  }

  // ==== htmlToText: quote-aware tag strip + one-pass entity decode ====

  test("property: htmlToText strips tags whose quoted attributes contain " +
    "'>' and decodes nested entities exactly one level") {
    // pinned edge semantics
    def h2t(s: String): String =
      Seq(Tuple1(s)).toDF("h")
        .select(Corpus.htmlToText(col("h"))).collect()(0).getString(0)
    assert(h2t("""<div data-x="a>b">W</div>""") == "W")
    assert(h2t("""<div data-x='a>b' class="c>d">W</div>""") == "W")
    assert(h2t("A&amp;amp;B") == "A&amp;B")
    assert(h2t("X&amp;lt;Y") == "X&lt;Y")
    // attribute VALUES are tag innards, not content — stripped with the tag
    assert(h2t("""<p title="5 &gt; 3">ok</p>""") == "ok")
    // generated: words wrapped in tags with adversarial quoted attributes
    // must come back as exactly the words
    val wordGen = Gen.listOfN(4, Gen.alphaStr.map(_.take(6)).suchThat(_.nonEmpty))
    val attrGen = Gen.oneOf("""q="a>b"""", """q='c>d'""", """q=">>>"""", "")
    val g = for {
      ws <- wordGen
      a1 <- attrGen
      a2 <- attrGen
    } yield (ws, s"<div $a1><p $a2>${ws.mkString(" ")}</p></div>")
    for ((ws, html) <- cases(g, 12)) {
      val out = h2t(html)
      assert(out == ws.mkString(" "), s"$html -> '$out'")
    }
  }

  // ==== container probe: arbitrary corruption never fails the job ====

  test("property: containerProbe yields exactly one row per payload under " +
    "random truncation and byte mutation (corruption degrades to a row, " +
    "never an exception)") {
    val ids = (0L until 8L).toDF("id")
    val clean = Multimodal.syntheticContainerTable(spark, ids, "id")
      .collect()
    val mutGen = for {
      rec <- Gen.oneOf(clean.indices)
      cut <- Gen.choose(0, clean(rec).payload.length) // any truncation point
      flipAt <- Gen.choose(0, math.max(0, cut - 1))
      flipTo <- Gen.choose(0, 255)
    } yield {
      val p = java.util.Arrays.copyOf(clean(rec).payload, cut)
      if (p.nonEmpty) p(math.min(flipAt, p.length - 1)) = flipTo.toByte
      Multimodal.MediaRecord(rec.toLong, "video", p, "application/octet-stream",
        Map.empty)
    }
    val mutated = cases(mutGen, 60)
    // adversarial fixed payloads on top of the generated ones: the bare
    // EBML magic, a 0x00 lead byte after the magic (vintWidth > 8), and
    // the truncation offsets the old suite happened to miss
    val fixed = Seq(
      Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte, 0xa3.toByte),
      Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte, 0xa3.toByte, 0x00, 0x00),
      clean(1).payload.take(19),
      clean(0).payload.take(9) // ftyp box header cut mid-brand
    ).zipWithIndex.map { case (p, i) =>
      Multimodal.MediaRecord(100L + i, "video", p, "application/octet-stream",
        Map.empty)
    }
    val all = mutated ++ fixed
    val out = Multimodal.containerProbe(spark.createDataset(all)).collect()
    assert(out.length == all.length,
      s"probe dropped rows: ${all.length} in, ${out.length} out")
    assert(out.map(_.media_id).sorted.toSeq ==
      all.map(_.media_id).sorted.toSeq)
  }

  test("theil_sen_stats throws loudly past 65536 points (the Int pair-count " +
    "overflow bound) on both entry points; 65536 itself is accepted") {
    import spark.implicits._
    // the public column function over an arbitrary array
    val over = Seq(65537).toDF("n")
      .select(graft.functions.series.theil_sen_stats(
        expr("transform(sequence(1, n), i -> struct(CAST(i AS BIGINT) AS x, " +
          "CAST(i AS BIGINT) AS y))")).as("r"))
    val e = intercept[Exception](over.collect())
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && (c.getCause ne c)) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(e).contains("65536"),
      s"expected the documented cap in the error, got: ${rootMsg(e)}")
    // the operator wrapper rejects the config before any work
    val tiny = Seq((1L, 1L, 10L)).toDF("k", "pos", "y")
    val e2 = intercept[IllegalArgumentException](
      graft.ts.Smooth.theilSen(tiny, Seq("pos"), "y", Seq("k"),
        maxPoints = 65537))
    assert(e2.getMessage.contains("65536"))
    // the boundary itself stays inside the contract (prefix capped at n=3
    // rows of data — the cap bounds POINTS, not rows present)
    val ok = graft.ts.Smooth.theilSen(
      Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L)).toDF("k", "pos", "y"),
      Seq("pos"), "y", Seq("k"), maxPoints = 65536).collect()
    assert(ok.length == 1)
  }
}
