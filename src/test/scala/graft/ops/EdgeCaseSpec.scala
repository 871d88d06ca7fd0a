package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the corpus/similarity operators: empty
  * frames, empty strings, all-identical content. These paths only surface
  * in production (an empty increment, a filtered-out stratum) — each must
  * return an empty/sane result, never throw.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("line dedup, tfidf, repetition, packing on an EMPTY corpus return empty") {
    assert(Corpus.dedupLines(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextStats.tfIdf(emptyDocs, "doc_id", "text").count() == 0)
    assert(Corpus.repetitionStats(emptyDocs, "text").count() == 0)
    val packed = Corpus.packSequences(
      Seq.empty[(Long, Long, Long)].toDF("id", "bucket", "n"), "id", "n", "bucket", 256)
    assert(packed.count() == 0)
  }

  test("round-4 ops on an EMPTY corpus return empty, never throw") {
    assert(TextStats.lmScore(emptyDocs, "doc_id", "text").count() == 0)
    assert(Corpus.chunkTokens(emptyDocs, "doc_id", "text", 8, 4).count() == 0)
    assert(Corpus.shardAssign(emptyDocs, "doc_id", 4).count() == 0)
    assert(Dedup.sharedSpanPairs(emptyDocs, "doc_id", "text", k = 4, minSpan = 4).count() == 0)
  }

  test("sharedSpanPairs: all docs shorter than k yields empty, not an error") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.sharedSpanPairs(docs, "doc_id", "text", k = 8, minSpan = 8).count() == 0)
  }

  test("recallAtK with an empty approx side scores every truth query zero") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "corpus_id", "rank")
    val approx = Seq.empty[(Long, Long, Int)].toDF("query_id", "corpus_id", "rank")
    val out = Similarity.recallAtK(truth, approx, k = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq((1L, 0L, 0L)))
  }

  test("contamination with an empty benchmark set flags nothing") {
    val train = Seq((1L, "some words here now")).toDF("doc_id", "text")
    assert(Corpus.contamination(train, emptyDocs, "doc_id", "text").count() == 0)
  }

  test("stratifiedSample of an empty frame / unmatched strata is empty, not an error") {
    assert(Corpus.stratifiedSample(
      Seq.empty[(Long, String, String)].toDF("id", "s", "text"),
      "s", "text", Map("en" -> 1.0)).count() == 0)
  }

  test("topQuantileFilter on an empty frame returns empty (null threshold filters all)") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "score")
    assert(Corpus.topQuantileFilter(empty, "score", 0.8).count() == 0)
  }

  test("incrementalExact with empty increment or empty corpus") {
    val docs = Seq((1L, "content a")).toDF("doc_id", "text")
    assert(Dedup.incrementalExact(emptyDocs, docs, "doc_id", "text").count() == 0)
    // empty KNOWN corpus: everything in the increment is new
    val out = Dedup.incrementalExact(docs, emptyDocs, "doc_id", "text")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("minhash signatures of empty and whitespace-only text do not throw") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 3, 8).collect()
    assert(sigs.length == 3) // every doc gets a whole-text shingle
    // empty and whitespace-only normalize to the same single shingle
    val byId = sigs.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(byId(1L) == byId(2L) && byId(1L) != byId(3L))
  }

  test("nearDupClusters on a single-doc corpus labels it a singleton") {
    val one = Seq((7L, "just one document")).toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(one, "doc_id", "text").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 7L)))
  }

  test("semanticDedup on an empty embedding table returns empty") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    assert(Similarity.semanticDedup(empty, "id", "vec", 0.9, nlist = 4).count() == 0)
  }

  test("quantize of an empty-array embedding yields empty codes, scale null-safe") {
    val df = Seq((1L, Array.empty[Float]), (2L, Array(1.0f))).toDF("id", "vec")
    val out = df
      .withColumn("scale", Similarity.quantScale(col("vec")))
      .withColumn("codes", Similarity.quantizeInt8(col("vec"), col("scale")))
      .orderBy("id").collect()
    // array_max of [] is null -> scale null -> codes null (not a crash);
    // callers filter empty vectors upstream, this pins the no-throw contract
    assert(out(0).isNullAt(2) || out(0).getSeq[Long](3) == Seq.empty[Long])
    assert(out(1).getSeq[Long](3) == Seq(127L))
  }
}
