package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal -> 0, identical -> 1") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")
    assert(df.select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
    val same = Seq((Array(1.0, 1.0), Array(2.0, 2.0))).toDF("a", "b")
    assert(math.abs(same.select(Similarity.cosine(col("a"), col("b")))
      .head().getDouble(0) - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("id", "vec")
    val queries = corpus.filter(col("id") === 1L)
    val out = Similarity.bruteForceTopK(corpus, queries, "id", "vec", "id", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L)) // by descending cosine
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    assert(out(0).getDouble(2) > 0.99)
  }

  test("recallAtK: exact ppm per query, zero-hit queries still score") {
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3), (2L, 23L, 4)
    ).toDF("query_id", "corpus_id", "rank")
    val approx = Seq(
      (1L, 10L, 1), (1L, 12L, 2), (1L, 99L, 3), (1L, 13L, 4), // 3/4 hit
      (2L, 98L, 1), (2L, 97L, 2) // 0/4 hit, short result
    ).toDF("query_id", "corpus_id", "rank")
    val out = Similarity.recallAtK(truth, approx, k = 4)
      .orderBy("query_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 3L, 4L, 750000L), (2L, 0L, 4L, 0L)))
  }

  test("recallAtK ignores rows ranked past k on both sides") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("query_id", "corpus_id", "rank")
    val approx = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 12L, 3)).toDF("query_id", "corpus_id", "rank")
    val out = Similarity.recallAtK(truth, approx, k = 2).collect()
    // truth = {10, 11}, approx = {11, 10}: rank-3 rows excluded from both
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 2L, 2L, 1000000L)))
  }

  test("lshTopK finds an identical vector (always same bucket)") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, -0.5f)),
      (2L, Array(1.0f, 0.0f, 0.5f, -0.5f)), // duplicate of 1
      (3L, Array(-1.0f, 0.2f, -0.5f, 0.9f)),
      (4L, Array(0.3f, -0.8f, 0.1f, 0.4f))
    ).toDF("id", "vec")
    val queries = corpus.filter(col("id") === 1L)
    val out = Similarity.lshTopK(corpus, queries, "id", "vec", "id",
      k = 2, bits = 4, tables = 2, dim = 4)
    val top = out.orderBy("rank").collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(1) == 2L) // the duplicate must be rank 1
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-12)
  }

  test("ivfTopK finds an identical vector via its centroid cell") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // duplicate of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, Array(0.9f, 0.1f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    val queries = corpus.filter(col("id") === 1L)
    val out = Similarity.ivfTopK(corpus, queries, "id", "vec", "id",
      k = 2, nlist = 3, nprobe = 2).orderBy("rank").collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(1) == 2L)
    assert(math.abs(out.head.getDouble(2) - 1.0) < 1e-12)
  }

  test("kmeansCentroids converges to well-separated cluster directions") {
    // three tight clusters around orthogonal axes; seed sample (first 3 ids)
    // is all-cluster-A, so only real Lloyd rounds can separate them
    val rows = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)), (2L, Array(1.0f, -0.01f, 0.0f)),
      (3L, Array(0.99f, 0.02f, 0.0f)), (4L, Array(0.0f, 1.0f, 0.01f)),
      (5L, Array(0.01f, 1.0f, 0.0f)), (6L, Array(0.0f, 0.99f, -0.01f)),
      (7L, Array(0.0f, 0.01f, 1.0f)), (8L, Array(-0.01f, 0.0f, 1.0f)),
      (9L, Array(0.0f, 0.0f, 0.98f))
    ).toDF("id", "vec")
    val cents = Similarity.kmeansCentroids(rows, "id", "vec", nlist = 3, iters = 4)
      .collect().map(r => r.getSeq[Double](1))
    // every cluster axis must be some centroid's dominant component
    def argmax(v: Seq[Double]) = v.indexOf(v.max)
    assert(cents.map(argmax).toSet == Set(0, 1, 2))
    // refined IVF must retrieve the duplicate exactly like the sampled form
    val queries = rows.filter(col("id") === 4L)
    val out = Similarity.ivfTopK(rows, queries, "id", "vec", "id",
      k = 2, nlist = 3, nprobe = 1, refineIters = 3).orderBy("rank").collect()
    assert(out.nonEmpty)
    assert(Set(5L, 6L).contains(out.head.getLong(1))) // same-cluster neighbor
  }

  test("kmeansCentroids with iters=0 returns the deterministic seed sample") {
    val rows = Seq(
      (3L, Array(0.0f, 1.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.5f, 0.5f))
    ).toDF("id", "vec")
    val cents = Similarity.kmeansCentroids(rows, "id", "vec", nlist = 2, iters = 0)
      .orderBy("cell").collect()
    assert(cents.length == 2)
    assert(cents(0).getSeq[Double](1) == Seq(1.0, 0.0)) // id=1 first
    assert(cents(1).getSeq[Double](1) == Seq(0.5, 0.5)) // id=2 second
  }

  test("cosineNearDupPairs finds near-identical embeddings above threshold") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("id", "vec")
    val pairs = Similarity.cosineNearDupPairs(df, "id", "vec", threshold = 0.99,
      bits = 4, tables = 2, dim = 4).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
  }

  test("quantizeInt8: max-abs maps to ±127, roundtrip cosine stays >0.999, zero vec safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    val q = df
      .withColumn("scale", Similarity.quantScale(col("vec")))
      .withColumn("codes", Similarity.quantizeInt8(col("vec"), col("scale")))
      .withColumn("deq", Similarity.dequantizeInt8(col("codes"), col("scale")))
      .orderBy("id").collect()
    assert(q(0).getSeq[Long](q(0).fieldIndex("codes")) == Seq(64L, -127L, 32L, 0L))
    assert(q(1).getSeq[Long](q(1).fieldIndex("codes")) == Seq(0L, 0L, 0L, 0L))
    val cos = df.filter(col("id") === 1)
      .withColumn("scale", Similarity.quantScale(col("vec")))
      .withColumn("codes", Similarity.quantizeInt8(col("vec"), col("scale")))
      .select(Similarity.cosine(
        transform(col("vec"), _.cast("double")),
        Similarity.dequantizeInt8(col("codes"), col("scale"))))
      .head().getDouble(0)
    assert(cos > 0.999)
  }

  test("semanticDedup: zero-norm vector lands in a real cell, not phantom -1") {
    // cosine(0-vector, anything) is null, so the argmax fold never updates
    // and used to emit cell -1 — a phantom cell. Pinned: the row survives,
    // self-clusters (null cosine matches nothing), and centroid recompute
    // still sees every row.
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.001f)),
      (3L, Array(0.0f, 0.0f))).toDF("id", "vec")
    // nlist=1: everything shares a cell, so the zero vector WOULD merge with
    // 1 and 2 if its cosine compared as >= threshold (the NaN trap)
    val out = Similarity.semanticDedup(df, "id", "vec", threshold = 0.99, nlist = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), "zero vector must not be dropped")
    assert(out.find(_._1 == 3L).get._2 == 3L)
    assert(out.find(_._1 == 2L).get._2 == 1L) // real near-dups still merge
    // kmeans recompute with a zero vector present keeps all nlist centroids
    val cents = Similarity.kmeansCentroids(df, "id", "vec", nlist = 2, iters = 2)
    assert(cents.count() == 2)
  }

  test("pqAnnTopK: exact ADC sums, quantization loss visible vs l2TopK truth") {
    // dim=4, m=2, k=2: codebook seeds from the 2 lowest ids, so every
    // centroid is hand-known. All coordinates are exact binary floats.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // codebook: sub0 c1=[1,0], sub1 c1=[0,0]
      (2L, Array(0.0f, 1.0f, 0.0f, 1.0f)),  // codebook: sub0 c2=[0,1], sub1 c2=[0,1]
      (3L, Array(1.0f, 0.5f, 0.0f, 0.75f)), // codes -> (c1, c2)
      (4L, Array(0.0f, 0.0f, 0.0f, 0.0f))   // codes -> (c1, c1): collapses onto q
    ).toDF("id", "vec")
    val q = corpus.filter(col("id") === 1L)
    val adc = Similarity.pqAnnTopK(corpus, q, "id", "vec", "id",
      dim = 4, m = 2, k = 2, topK = 3)
    val rows = adc.orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // LUT for q=1: sub0 {c1->0, c2->2e6}, sub1 {c1->0, c2->1e6}; the zero
    // vector quantizes onto q's own codes and wins, ABOVE the truly-closer 3
    assert(rows.toSeq == Seq((4L, 0L, 1), (3L, 1000000L, 2), (2L, 3000000L, 3)))
    val truth = Similarity.l2TopK(corpus, q, "id", "vec", "id", topK = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // exact order differs: 3 (0.8125) beats 4 (1.0) — quantization loss
    assert(truth.toSeq == Seq((3L, 812500L), (4L, 1000000L), (2L, 3000000L)))
    val recall = Similarity.recallAtK(
      Similarity.l2TopK(corpus, q, "id", "vec", "id", topK = 1),
      Similarity.pqAnnTopK(corpus, q, "id", "vec", "id", dim = 4, m = 2, k = 2, topK = 1),
      k = 1).collect()
    assert(recall.map(r => (r.getLong(0), r.getLong(3))).toSeq == Seq((1L, 0L)))
    // the corpus-sized side must join the LUT by broadcast, never shuffle it
    val plan = adc.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcast"), s"ADC LUT join must broadcast:\n$plan")
  }

  test("ivfPqTopK: probing ALL cells reproduces pqAnnTopK exactly; probing " +
    "fewer cells returns a subset with identical ADC sums") {
    val vecs = (0 until 40).map { i =>
      val v = Array.fill(8)(0.0f)
      v(i % 8) = 1.0f + (i / 8) * 0.25f
      v(7 - i % 8) += 0.125f * (i % 3)
      (i.toLong, v)
    }.toDF("id", "vec")
    val qs = vecs.filter(col("id") < 4)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val full = Similarity.pqAnnTopK(vecs, qs, "id", "vec", "id",
      dim = 8, m = 2, k = 8, topK = 3).collect()
    val allCells = Similarity.ivfPqTopK(vecs, qs, "id", "vec", "id",
      dim = 8, m = 2, k = 8, nlist = 4, nprobe = 4, topK = 3).collect()
    assert(allCells.map(r => (key(r), r.getLong(2), r.getInt(3))).toSet ==
      full.map(r => (key(r), r.getLong(2), r.getInt(3))).toSet,
      "nprobe = nlist must degenerate to plain PQ-ADC")

    val probed = Similarity.ivfPqTopK(vecs, qs, "id", "vec", "id",
      dim = 8, m = 2, k = 8, nlist = 4, nprobe = 2, topK = 3).collect()
    val fullAdc = full.map(r => key(r) -> r.getLong(2)).toMap
    // every surviving pair carries the SAME integer ADC sum as the
    // unrestricted search — cells gate candidates, never change scores
    probed.foreach { r =>
      fullAdc.get(key(r)).foreach(adc => assert(adc == r.getLong(2),
        s"ADC changed under cell gating at ${key(r)}"))
    }
    assert(probed.length <= full.length)
  }

  test("semanticDedup clusters planted near-duplicates, leaves singletons alone") {
    // two tight duplicate groups along different axes + isolated vectors
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(8)(0.0f); a(axis) = 1.0f; a((axis + 1) % 8) = eps; a
    }
    // ids interleaved so the first-nlist centroid seeds span BOTH groups
    // (SemDeDup compares only within a cell: dups split across cells are
    // the method's accepted miss, not what this test probes)
    val df = Seq(
      (1L, vec(0, 0.001f)), (3L, vec(0, 0.002f)), (5L, vec(0, 0.003f)),
      (2L, vec(3, 0.001f)), (4L, vec(3, 0.002f)),
      (6L, vec(6, 0.0f))).toDF("id", "vec")
    val out = Similarity.semanticDedup(df, "id", "vec", threshold = 0.99,
      nlist = 2, refineIters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.filter(p => Seq(1L, 3L, 5L).contains(p._1)).map(_._2).distinct.toSeq == Seq(1L))
    assert(out.filter(p => p._1 == 2L || p._1 == 4L).map(_._2).distinct.toSeq == Seq(2L))
    assert(out.find(_._1 == 6L).get._2 == 6L)
  }

  test("centroidOutliers: the off-cluster vector flags, tight members don't, " +
    "zero-norm flags null; centroid table joins by broadcast") {
    // group 0 clusters on +x with one vector pointing -x; group 1 on +y
    val df = Seq(
      (1L, 0, Array(1.0f, 0.1f, 0f, 0f)),
      (2L, 0, Array(1.0f, -0.1f, 0f, 0f)),
      (3L, 0, Array(0.9f, 0f, 0.1f, 0f)),
      (4L, 0, Array(-1.0f, 0f, 0f, 0f)),     // opposes its centroid
      (5L, 1, Array(0f, 0f, 1.0f, 0.2f)),
      (6L, 1, Array(0f, 0f, 1.0f, -0.2f)),
      (7L, 1, Array(0f, 0f, 0f, 0f))          // zero norm
    ).toDF("id", "grp", "vec")
    val out = Similarity.centroidOutliers(df, "id", "vec", "grp", threshold = 0.5)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    assert(!rows(1L)._2 && !rows(2L)._2 && !rows(3L)._2,
      s"tight members must not flag: $rows")
    assert(rows(4L)._2 && rows(4L)._1.get < 0,
      "the opposing vector must flag with negative cosine")
    assert(!rows(5L)._2 && !rows(6L)._2)
    assert(rows(7L)._2 && rows(7L)._1.isEmpty,
      "zero-norm scores null and flags")
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcast"), s"centroid sums must broadcast:\n$plan")
  }

  test("powerIterationTopPc recovers the dominant direction of a planted " +
    "anisotropic cloud; projections separate the two sign groups") {
    // 40 vectors along ±e1 with small e2/e3 noise: PC1 must align with e1
    val vecs = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      val n1 = ((i * 37 % 11) - 5) / 100.0f
      val n2 = ((i * 53 % 13) - 6) / 100.0f
      (i.toLong, if (i % 2 == 0) 0 else 1,
        Array(sign, n1, n2, 0.0f))
    }
    val df = vecs.toDF("vec_id", "grp", "vec")
    val v = Similarity.powerIterationTopPc(df, "vec", iters = 4)
    assert(v.length == 4)
    // dominant axis has the max magnitude (normalized to ±1e6)
    assert(math.abs(v(0)) == 1000000L,
      s"PC1 must align with the planted axis: ${v.toSeq}")
    assert(math.abs(v(1)) < 200000L && math.abs(v(2)) < 200000L,
      s"noise axes stay small: ${v.toSeq}")
    // exact-integer projections separate the sign groups
    val proj = df.select(col("grp"),
        Similarity.projectionMicro(col("vec"), v).as("p"))
      .groupBy("grp").agg(sum(col("p")).as("sp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(proj(0).signum != proj(1).signum && proj(0) != 0L,
      s"sign groups must project to opposite sides: $proj")
    // determinism: a second run returns the identical trajectory
    assert(Similarity.powerIterationTopPc(df, "vec", iters = 4).toSeq == v.toSeq)
  }

  test("kmeansInertiaMicro: inertia shrinks as k grows toward the planted " +
    "cluster count; exact at k = #clusters; deterministic") {
    // 4 orthogonal planted directions, 8 members each (exact duplicates)
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val df = (0 until 32).map(i => (i.toLong, base(i % 4)))
      .toDF("id", "vec")
    def inertia(k: Int): Long =
      Similarity.kmeansInertiaMicro(df, "id", "vec", nlist = k, iters = 1)
        .collect()(0).getLong(1)
    // k=2 can't cover 4 orthogonal directions; k=4 seeds one per cluster
    // (ids 0..3 are the 4 distinct directions) -> every cosine is exactly 1
    assert(inertia(2) > 0L, "2 centroids can't cover 4 orthogonal clusters")
    assert(inertia(4) == 0L, "k = #clusters with duplicate members is exact")
    assert(inertia(2) == inertia(2), "deterministic")
  }

  test("gramMicro is symmetric with exact integer entries and dim² rows") {
    val df = Seq(
      (1L, Array(0.5f, -0.25f, 0.0f)),
      (2L, Array(1.0f, 0.5f, -1.0f))
    ).toDF("id", "vec")
    val g = Similarity.gramMicro(df, "vec").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(g.size == 9)
    // q1 = (500000, -250000, 0), q2 = (1000000, 500000, -1000000)
    assert(g((0, 0)) == 500000L * 500000L + 1000000L * 1000000L)
    assert(g((0, 1)) == 500000L * -250000L + 1000000L * 500000L)
    for (a <- 0 until 3; b <- 0 until 3) assert(g((a, b)) == g((b, a)))
  }

  test("centroidSilhouette: planted orthogonal clusters score a perfect 1e6") {
    // 4 orthogonal directions, duplicated members: a = 0 (own centroid is
    // the point itself), b = 1 - cos(orthogonal) = 1e6 micro -> s = 1e6 ppm
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val df = (0 until 32).map(i => (i.toLong, base(i % 4))).toDF("id", "vec")
    val rows = Similarity.centroidSilhouette(df, "id", "vec", nlist = 4, iters = 1)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 8L)
      assert(r.getAs[Long]("sum_a_micro") == 0L, "member == centroid")
      assert(r.getAs[Long]("mean_s_ppm") == 1000000L)
    }
  }

  test("centroidSilhouette: a <= b always (assignment is the argmax) and " +
    "smeared clusters score strictly below tight ones") {
    // members vary WITHIN each cluster (otherwise a = 0 and s is trivially
    // 1e6); smear leans members much further toward the opposite pole
    def cloud(lean: Float, idBase: Long) = (0 until 16).map { i =>
      val t = lean * (i % 5) / 4f
      val v = if (i % 2 == 0) Array(1f, t, 0f, 0f) else Array(t, 1f, 0f, 0f)
      (idBase + i, v)
    }
    val tight = cloud(0.1f, 0L)
    val smear = cloud(0.9f, 100L)
    def meanS(rows: Seq[(Long, Array[Float])]): Long = {
      import org.apache.spark.sql.functions.{col, sum => fsum}
      val df = rows.toDF("id", "vec")
      val per = Similarity.centroidSilhouette(df, "id", "vec", nlist = 2, iters = 1)
      per.collect().foreach { r =>
        assert(r.getAs[Long]("sum_a_micro") <= r.getAs[Long]("sum_b_micro"))
      }
      val t = per.agg(fsum(col("sum_s_ppm")), fsum(col("n_vecs"))).collect()(0)
      t.getLong(0) / t.getLong(1)
    }
    assert(meanS(tight) > meanS(smear), "tighter clusters -> higher silhouette")
  }

  test("kCenterGreedy: picks the spread-out corners before any clutter, " +
    "radii non-increasing, trajectory deterministic") {
    // 4 orthogonal corners + clutter duplicated near corner 0
    val corners = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f)), (3L, Array(0f, 0f, 0f, 1f)))
    val clutter = (10L to 20L).map(i => (i, Array(0.99f, 0.01f, 0f, 0f)))
    val df = (corners ++ clutter).toDF("id", "vec")
    val rows = Similarity.kCenterGreedy(df, "id", "vec", k = 4).orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).toSet == Set(0L, 1L, 2L, 3L),
      s"maxmin must select all 4 corners first, got ${rows.toSeq}")
    assert(rows.head == ((0, 0L, 0L)), "seed = smallest id at distance 0")
    val radii = rows.tail.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"maxmin radii must be non-increasing, got ${radii.toSeq}")
    val again = Similarity.kCenterGreedy(df, "id", "vec", k = 4).orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("filteredTopK: ranks only within the query's label class") {
    // label 1: near-identical family; label 2: a higher-cosine stranger
    // that an unfiltered top-k would surface
    val rows = Seq(
      (1L, 1, Array(1f, 0f, 0f, 0f)),
      (2L, 1, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, 1, Array(0.8f, 0.2f, 0f, 0f)),
      (4L, 2, Array(0.99f, 0.01f, 0f, 0f)),
      (5L, 2, Array(0f, 1f, 0f, 0f)))
    val df = rows.toDF("id", "label", "vec")
    val got = Similarity.filteredTopK(df, df.filter($"id" === 1L),
        "id", "vec", "id", "label", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((2L, 1), (3L, 2)),
      s"stranger with higher cosine but wrong label must not rank: ${got.toSeq}")
    val bf = Similarity.bruteForceTopK(
        df.filter($"label" === 1), df.filter($"id" === 1L), "id", "vec", "id", 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == bf.toSeq, "filtered == brute force on the label slice")
  }

  test("lshMultiprobeStats: r0 candidates are a subset of r1, hits bounded " +
    "by k, and every same-bucket corpus row is an r0 candidate") {
    val dim = 64
    val rng = new scala.util.Random(7)
    val rows = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("id", "vec")
    val out = Similarity.lshMultiprobeStats(df, df.filter($"id" < 5L),
        "id", "vec", "id", k = 5, bits = 6, dim = dim)
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      val (c0, c1) = (r.getAs[Long]("n_cand_r0"), r.getAs[Long]("n_cand_r1"))
      val (h0, h1) = (r.getAs[Long]("n_hits_r0"), r.getAs[Long]("n_hits_r1"))
      assert(c0 <= c1, s"r0 must be a subset of r1: $r")
      assert(h0 <= h1 && h1 <= 5L, s"hits bounded by k and monotone: $r")
      assert(h0 <= c0 && h1 <= c1)
    }
    // r0 candidacy is exactly bucket equality: recompute buckets directly
    val planes = Similarity.hyperplanes(dim, 6, 42L)
    val b = df.select($"id", Similarity.lshBucket($"vec", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expR0 = (0L until 5L).map(q =>
      q -> rows.map(_._1).count(c => c != q && b(c) == b(q)).toLong).toMap
    val gotR0 = out.map(r => r.getLong(0) -> r.getAs[Long]("n_cand_r0")).toMap
    assert(gotR0 == expR0, s"got $gotR0 want $expR0")
  }

  test("rpTreeLeaves: median splits keep leaves balanced even on a " +
    "pathologically skewed cloud where LSH sign-buckets collapse") {
    val dim = 64
    val rng = new scala.util.Random(11)
    // all vectors in a tight cone around +e1: every sign-LSH bit is
    // identical (one giant bucket), but median splits still partition
    val rows = (0L until 64L).map { i =>
      val v = Array.fill(dim)(rng.nextGaussian().toFloat * 0.01f)
      v(0) = 10f + rng.nextFloat()
      (i, v)
    }
    val df = rows.toDF("id", "vec")
    val leaves = Similarity.rpTreeLeaves(df, "id", "vec", depth = 3, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val sizes = leaves.groupBy(_._2).map(_._2.length)
    assert(leaves.length == 64)
    assert(sizes.size == 8, s"3 levels must produce 8 leaves: $sizes")
    assert(sizes.max == 8 && sizes.min == 8,
      s"median splits on 64 points give exactly 8 per leaf: $sizes")
    // the LSH comparison: one table, every point in the same sign bucket
    val planes = Similarity.hyperplanes(dim, 3, 42L)
    val b = df.select(Similarity.lshBucket($"vec", planes).as("b"))
      .distinct().count()
    assert(b <= 2, s"the cone collapses sign-LSH to <=2 buckets, got $b")
  }

  test("rpTreeStats: hits bounded by k and by candidate count; leaves " +
    "match rpTreeLeaves") {
    val dim = 64
    val rng = new scala.util.Random(5)
    val rows = (0L until 80L).map(i =>
      (i, Array.fill(dim)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("id", "vec")
    val out = Similarity.rpTreeStats(df, df.filter($"id" < 4L),
        "id", "vec", "id", k = 5, depth = 3, dim = dim).collect()
    assert(out.length == 4)
    val leafOf = Similarity.rpTreeLeaves(df, "id", "vec", 3, dim)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(r.getInt(r.fieldIndex("leaf")) == leafOf(r.getLong(0)))
      val (c, h) = (r.getAs[Long]("n_cand"), r.getAs[Long]("n_hits"))
      assert(h <= 5L && h <= c)
      assert(c == leafOf.values.count(_ == leafOf(r.getLong(0))) - 1L)
    }
  }

  test("rpTreeStats: a query vector ABSENT from the corpus is routed " +
    "through the fitted splits and still emits its row") {
    val dim = 64
    val rng = new scala.util.Random(7)
    val rows = (0L until 64L).map(i =>
      (i, Array.fill(dim)(rng.nextGaussian().toFloat)))
    val corpus = rows.toDF("id", "vec")
    // query id 999 does not exist in the corpus; its VECTOR equals corpus
    // row 3's, so split routing must land it in exactly row 3's leaf and
    // count row 3 itself among the candidates (no self-exclusion: ids differ)
    val q = Seq((999L, rows(3)._2)).toDF("qid", "vec")
    val out = Similarity.rpTreeStats(corpus, q, "id", "vec", "qid",
      k = 5, depth = 3, dim = dim).collect()
    assert(out.length == 1, s"out-of-corpus query must emit a row: ${out.toSeq}")
    val leafOf = Similarity.rpTreeLeaves(corpus, "id", "vec", 3, dim)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r = out.head
    assert(r.getLong(r.fieldIndex("query_id")) == 999L)
    assert(r.getInt(r.fieldIndex("leaf")) == leafOf(3L),
      "identical vector must route to the same leaf as its corpus twin")
    // 64 points / 8 leaves = 8 per leaf, all of them candidates (id differs)
    assert(r.getAs[Long]("n_cand") == 8L, r.toString)
  }
}
