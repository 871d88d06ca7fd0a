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
}
