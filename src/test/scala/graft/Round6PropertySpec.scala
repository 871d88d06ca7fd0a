package graft

import graft.ops.Corpus
import graft.ts.{Changepoint, Smooth}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven invariants for the round-6 operators (the
  * [[Round5PropertySpec]] convention: fixed seeds, few heavy trials).
  */
class Round6PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int = 6): Seq[T] =
    (1 to n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  private val seriesGen: Gen[Seq[Long]] = for {
    n <- Gen.choose(3, 60)
    vs <- Gen.listOfN(n, Gen.choose(-500L, 500L))
  } yield vs

  test("property: theilSen kernel == percentile(pair slopes, 0.5) " +
    "bit-for-bit on arbitrary integer series") {
    for (vs <- cases(seriesGen)) {
      val df = vs.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
        .toDF("k", "pos", "y")
      val got = Smooth.theilSen(df, Seq("pos"), "y", Seq("k")).collect()(0)
      // reference: materialize the pairs and run Spark's own percentile
      val pairs = for {
        i <- vs.indices; j <- (i + 1) until vs.length
      } yield (vs(j) - vs(i)).toDouble / (j - i).toDouble
      val ref = pairs.toDF("s").agg(expr("percentile(s, 0.5)")).collect()(0)
        .getDouble(0)
      val slope = got.getDouble(got.fieldIndex("slope"))
      assert(java.lang.Double.doubleToLongBits(slope) ==
        java.lang.Double.doubleToLongBits(ref),
        s"kernel $slope vs percentile $ref on $vs")
      assert(got.getLong(got.fieldIndex("n_pairs")) ==
        vs.length.toLong * (vs.length - 1) / 2)
    }
  }

  test("property: binseg2 internal consistency — level-1 row is the " +
    "global |cusum| argmax, level-2 segments partition the series there, " +
    "and n/sums telescope within every row") {
    for (vs <- cases(seriesGen)) {
      val df = vs.zipWithIndex.map { case (v, i) => ("s", i.toLong + 1, v) }
        .toDF("k", "pos", "x")
      val out = Changepoint.binseg2(df, Seq("pos"), "x", Seq("k"))
        .orderBy("level", "segment").collect()
      assert(out.length == 3)
      val root = out(0)
      assert(root.getInt(root.fieldIndex("level")) == 1)
      assert(root.getLong(root.fieldIndex("n")) == vs.length.toLong)
      // every row telescopes: n = n_pre + n_post, segment sum splits
      out.foreach { r =>
        assert(r.getLong(r.fieldIndex("n")) ==
          r.getLong(r.fieldIndex("n_pre")) + r.getLong(r.fieldIndex("n_post")))
      }
      // the two level-2 halves cover the series exactly around the root cp
      val rootPre = root.getLong(root.fieldIndex("n_pre"))
      val halves = out.drop(1)
      assert(halves.map(r => r.getInt(r.fieldIndex("segment"))).toSet == Set(0, 1))
      val sizes = halves.map(r =>
        r.getInt(r.fieldIndex("segment")) -> r.getLong(r.fieldIndex("n"))).toMap
      assert(sizes(0) == rootPre, s"left half must be the pre-cp rows: $sizes")
      assert(sizes(1) == vs.length - rootPre)
      // level-1 argmax really is the max |num| over a from-scratch replay
      val n = vs.length.toLong
      val s = vs.sum
      val nums = vs.scanLeft((0L, 0L)) { case ((rs, rc), x) => (rs + x, rc + 1) }
        .tail.map { case (rs, rc) => n * rs - rc * s }
      assert(math.abs(root.getLong(root.fieldIndex("cusum_num"))) ==
        nums.map(math.abs).max)
    }
  }

  test("property: canonicalizeUrl is idempotent and order-insensitive " +
    "to query params on generated URLs") {
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Example.COM", "a.b.org", "X.io")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.choose(0, 3)
      path = (1 to segs).map(i => s"Seg$i").mkString("/", "/", "")
      slash <- Gen.oneOf("", "/", "//")
      params <- Gen.someOf(Seq("a=1", "B=2", "utm_source=x", "ref=r", "z=9"))
      frag <- Gen.oneOf("", "#top")
    } yield {
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      s"$scheme://$www$host$port$path$slash$q$frag"
    }
    def canon(us: Seq[String]): Seq[String] =
      us.toDF("u").select(Corpus.canonicalizeUrl(col("u")).as("c"))
        .collect().map(_.getString(0)).toSeq
    val urls = cases(urlGen, 40)
    val once = canon(urls)
    val twice = canon(once)
    once.zip(twice).zip(urls).foreach { case ((a, b), u) =>
      assert(a == b, s"not idempotent on $u: $a -> $b")
      assert(!a.contains("#") && !a.contains("utm_") && !a.contains("ref="),
        s"residual junk in $a (from $u)")
    }
    // param order never matters
    val flip = canon(Seq("https://a.com/p?z=9&B=2&a=1"))
    assert(flip == canon(Seq("https://a.com/p?a=1&B=2&z=9")))
  }

  test("property: htmlToText output is tag-free, never longer than the " +
    "input, and has no whitespace runs") {
    val htmlGen = for {
      words <- Gen.listOfN(8, Gen.alphaStr.map(_.take(6)))
      junk <- Gen.alphaStr.map(_.take(12))
    } yield s"<html><script>$junk</script><p>${words.take(4).mkString(" ")}" +
      s"</p>\n\n<div>${words.drop(4).mkString("  ")}</div></html>"
    for (h <- cases(htmlGen, 12)) {
      val out = Seq(Tuple1(h)).toDF("h")
        .select(Corpus.htmlToText(col("h"))).collect()(0).getString(0)
      assert(!out.contains("<") && !out.contains(">"), s"tags survive: $out")
      assert(out.length <= h.length)
      assert(!out.contains("  ") && !out.contains("\n"), s"runs survive: $out")
      assert(out == out.trim)
    }
  }
}
