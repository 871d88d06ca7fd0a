package graft

import graft.ops.{Behavior, Dedup}
import graft.ts.{Smooth, Spectral}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven invariants for the round-5 operators (the
  * [[graft.ts.PropertySpec]] convention: fixed seeds, few heavy trials).
  */
class Round5PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int = 6): Seq[T] =
    (1 to n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  private val seriesGen: Gen[Seq[Long]] = for {
    n <- Gen.choose(3, 60)
    vs <- Gen.listOfN(n, Gen.choose(-500L, 500L))
  } yield vs

  test("property: hampel repairs only what it flags — cleaned == x on " +
    "clean rows, == window median on flagged rows, MAD >= 0") {
    for (vs <- cases(seriesGen)) {
      val df = vs.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
        .toDF("k", "id", "v")
      val rows = Smooth.hampel(df, Seq("id"), "v", window = 5, k = 3,
          seriesCols = Seq("k"))
        .orderBy("id").collect()
      rows.zip(vs).foreach { case (r, x) =>
        val cleaned = r.getDouble(r.fieldIndex("cleaned"))
        val med = r.getDouble(r.fieldIndex("roll_med"))
        assert(r.getDouble(r.fieldIndex("roll_mad")) >= 0.0)
        if (r.getBoolean(r.fieldIndex("is_outlier"))) assert(cleaned == med)
        else assert(cleaned == x.toDouble)
      }
    }
  }

  test("property: periodogram is exactly invariant to adding a constant " +
    "(the x-n centering), and power is never negative") {
    for ((vs, c) <- cases(seriesGen).zip(Seq(7L, -100L, 250L, 13L, -1L, 99L))) {
      val a = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("idx", "x")
      val b = vs.zipWithIndex.map { case (v, i) => (i.toLong, v + c) }.toDF("idx", "x")
      val pa = Spectral.periodogram(a, "idx", "x", Seq(4, 7)).orderBy("period")
        .select("sc_u", "ss_u", "power").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val pb = Spectral.periodogram(b, "idx", "x", Seq(4, 7)).orderBy("period")
        .select("sc_u", "ss_u", "power").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pa.toSeq == pb.toSeq, s"shift by $c changed the spectrum")
      assert(pa.forall(_._3 >= 0.0))
    }
  }

  test("property: U_A + U_B == n_a * n_b (Mann-Whitney's mirror identity) " +
    "under arbitrary ties") {
    val pairGen = for {
      na <- Gen.choose(2, 25); nb <- Gen.choose(2, 25)
      as <- Gen.listOfN(na, Gen.choose(0L, 8L)) // narrow range forces ties
      bs <- Gen.listOfN(nb, Gen.choose(0L, 8L))
    } yield (as, bs)
    for ((as, bs) <- cases(pairGen)) {
      val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "v")
      val ra = Behavior.mannWhitneyU(df, "g", "a", "b", col("v")).head()
      val rb = Behavior.mannWhitneyU(df, "g", "b", "a", col("v")).head()
      val (u2a, u2b) = (ra.getDouble(ra.fieldIndex("u2_a")),
        rb.getDouble(rb.fieldIndex("u2_a")))
      assert(u2a + u2b == 2.0 * as.size * bs.size,
        s"U_A=$u2a/2 U_B=$u2b/2 n_a=${as.size} n_b=${bs.size}")
      assert(u2a >= 0 && u2a <= 2.0 * as.size * bs.size)
    }
  }

  test("property: scrub is the identity on a corpus with no shared spans, " +
    "and never removes from the EARLIEST doc of any pair") {
    val docs = (1L to 8L)
      .map(i => (i, (1 to 20).map(w => s"d${i}w$w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.scrubSharedSpans(docs, "doc_id", "text", 8, 12, 200)
      .collect()
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_removed")) == 0L)
      assert(r.getInt(r.fieldIndex("n_tokens")) == 20)
    }
  }

  test("property: funnel survivors are non-increasing in level and " +
    "conversion ppm is in [0, 1e6]") {
    val lvGen = Gen.listOfN(30, Gen.choose(0, 3))
    for (ls <- cases(lvGen)) {
      val df = ls.zipWithIndex.map { case (l, i) => (s"u$i", l) }
        .toDF("u", "level")
      val rows = Behavior.funnelDropoff(df, nSteps = 3).orderBy("level")
        .collect()
      val surv = rows.map(_.getLong(rows.head.fieldIndex("survivors")))
      assert(surv.zip(surv.tail).forall { case (a, b) => a >= b }, surv.toSeq)
      rows.foreach { r =>
        Option(r.get(r.fieldIndex("conv_ppm"))).foreach { p =>
          val v = p.asInstanceOf[Long]
          assert(v >= 0L && v <= 1000000L)
        }
      }
    }
  }

  test("property: bollinger flags partition — n_upper + n_lower <= n_eval, " +
    "and a constant series flags nothing at any k") {
    for (vs <- cases(seriesGen)) {
      val df = vs.zipWithIndex.map { case (v, i) => ("u", i.toLong, v) }
        .toDF("k", "pos", "x")
      val r = Smooth.bollingerBreaches(df, Seq("pos"), "x", window = 4,
        k = 2, seriesCols = Seq("k")).collect()
      r.foreach { row =>
        val (n, u, l) = (row.getAs[Long]("n_eval"),
          row.getAs[Long]("n_upper"), row.getAs[Long]("n_lower"))
        assert(u + l <= n && u >= 0 && l >= 0, row)
        assert(row.getAs[Long]("sum_varnum") >= 0L, row)
      }
      val const = (1 to 20).map(i => ("c", i.toLong, 7L)).toDF("k", "pos", "x")
      val rc = Smooth.bollingerBreaches(const, Seq("pos"), "x", 4, 2, Seq("k"))
        .collect().head
      assert(rc.getAs[Long]("n_upper") == 0L && rc.getAs[Long]("n_lower") == 0L)
    }
  }

  test("property: rsi stays in [0, 1e6]; reversing the series swaps " +
    "overbought and oversold counts") {
    for (vs <- cases(seriesGen) if vs.length >= 8) {
      val fwd = vs.zipWithIndex.map { case (v, i) => ("u", i.toLong, v) }
      val rev = vs.reverse.zipWithIndex.map { case (v, i) => ("u", i.toLong, v) }
      def run(s: Seq[(String, Long, Long)]) = Smooth.rsiCutler(
        s.toDF("k", "pos", "x"), Seq("pos"), "x", 4, Seq("k"))
        .collect().headOption
      (run(fwd), run(rev)) match {
        case (Some(f), Some(r)) =>
          assert(f.getAs[Long]("sum_rsi_ppm") >= 0L &&
            f.getAs[Long]("sum_rsi_ppm") <= f.getAs[Long]("n_eval") * 1000000L)
          // negating values swaps gains/losses exactly; reversal is a
          // weaker mirror (frame alignment shifts), so just bound checks
          assert(r.getAs[Long]("n_overbought") >= 0L)
        case _ => ()
      }
      // exact mirror: negated series swaps the flag counts
      val neg = vs.zipWithIndex.map { case (v, i) => ("u", i.toLong, -v) }
      (run(fwd), run(neg)) match {
        case (Some(f), Some(n)) =>
          assert(f.getAs[Long]("n_overbought") == n.getAs[Long]("n_oversold"),
            s"negation must swap flags: $f vs $n")
          assert(f.getAs[Long]("n_oversold") == n.getAs[Long]("n_overbought"))
        case _ => ()
      }
    }
  }

  test("property: haar L1 energy is invariant under value negation and " +
    "n_coeffs halves (up to rounding) per level") {
    for (vs <- cases(seriesGen) if vs.length >= 8) {
      val grid = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val neg = grid.map { case (i, v) => (i, -v) }
      def run(g: Seq[(Long, Long)]) = Spectral.haarL1(
        g.toDF("idx", "x"), "idx", "x", 3)
        .orderBy("level").collect()
        .map(r => (r.getInt(0), r.getAs[Long]("n_coeffs"),
          r.getAs[Long]("l1_energy")))
      val (a, b) = (run(grid), run(neg))
      assert(a.map(t => (t._1, t._3)).toSeq == b.map(t => (t._1, t._3)).toSeq,
        "negation preserves |D|")
      a.sliding(2).foreach {
        case Array((_, n1, _), (_, n2, _)) =>
          assert(n2 <= n1, "coefficient count must not grow with level")
        case _ => ()
      }
    }
  }

  test("property: pageCusum alarm count is non-increasing in h") {
    for (vs <- cases(seriesGen)) {
      val df = vs.zipWithIndex.map { case (v, i) => ("u", i.toLong, v) }
        .toDF("k", "pos", "x")
      def run(h: Long) = Smooth.pageCusum(df, Seq("pos"), "x", 0L, h, Seq("k"))
        .collect().head
      val (lo, hi) = (run(50L), run(500L))
      assert(lo.getAs[Long]("n_alarms") >= hi.getAs[Long]("n_alarms"),
        s"higher threshold cannot alarm more: $lo vs $hi")
    }
  }

  test("property: kaplanMeier survival is non-increasing in t and risk " +
    "sets telescope") {
    val lifeGen = for {
      n <- Gen.choose(4, 40)
      ds <- Gen.listOfN(n, Gen.choose(0L, 10L))
    } yield ds
    for (ds <- cases(lifeGen)) {
      val rows = ds.zipWithIndex.flatMap { case (d, i) =>
        Seq((s"s$i", ts("2024-01-01 00:00:00")),
          (s"s$i", new java.sql.Timestamp(
            ts("2024-01-01 00:00:00").getTime + d * 86400000L)))
      }
      val out = graft.ts.Survival.kaplanMeier(rows.toDF("u", "t"), "u", "t",
          to_timestamp(lit("2024-01-09"))).orderBy("t_days").collect()
      val surv = out.map(_.getAs[Double]("survival"))
      assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 },
        s"survival must not increase: ${surv.toSeq}")
      val risk = out.map(_.getAs[Long]("n_risk"))
      assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
        s"risk sets shrink strictly across death times: ${risk.toSeq}")
    }
  }
}
