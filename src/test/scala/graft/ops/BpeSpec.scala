package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich toy corpus shape: shared stems force stem merges first
  private def corpus = Seq(
    (1L, "low low low low low lower lower newest newest newest"),
    (2L, "newest newest newest widest widest widest")
  ).toDF("doc_id", "text")

  test("wordCounts: one row per surface form, marker appended, counts exact") {
    val wc = Bpe.wordCounts(corpus, "text").collect()
      .map(r => (r.getAs[String]("w0"), r.getAs[String]("w"),
        r.getAs[Long]("f"))).toSet
    assert(wc === Set(
      ("low", "low_", 5L), ("lower", "lower_", 2L),
      ("newest", "newest_", 6L), ("widest", "widest_", 3L)))
  }

  test("training learns classic merges: highest-count pair wins each round, " +
    "expansions recurse to base chars") {
    val (merges, _) = Bpe.train(Bpe.wordCounts(corpus, "text"), 4)
    // round 0: 'es' appears in newest(6) + widest(3) = 9 — the max
    // (st=9 ties; 'es' < 'st' lexicographically)
    assert(merges(0).lhs === "e" && merges(0).rhs === "s" &&
      merges(0).pairCount === 9L)
    // round 1: '(es)t' and 't_' still tie at 9, but the tie-break runs on
    // REMAPPED symbols and 't' (0x74) sorts before the private-use 'es' symbol (0xE000) -- 't_' wins
    assert(merges(1).lhs === "t" && merges(1).rhs === "_" &&
      merges(1).merged === "t_" && merges(1).pairCount === 9L)
    // round 2: '(es)(t_)' = 9 (newest_ 6 + widest_ 3)
    assert(merges(2).merged === "est_" && merges(2).pairCount === 9L)
    // round 3: 'lo' = 7 (low 5 + lower 2)
    assert(merges(3).lhs === "l" && merges(3).rhs === "o" &&
      merges(3).pairCount === 7L)
    // every expansion is base-alphabet only
    merges.foreach(m => assert(m.merged.matches("[a-z_]+"), m.toString))
  }

  test("merge application is greedy left-to-right non-overlapping: " +
    "aaaa + (a,a) -> two merged symbols, aaa -> merged + lone a") {
    val words = Seq(("aaaa", "aaaa_", 10L), ("aaa", "aaa_", 1L))
      .toDF("w0", "w", "f")
    val (merges, vocab) = Bpe.train(words, 1)
    assert(merges(0).lhs === "a" && merges(0).rhs === "a")
    val out = vocab.collect()
      .map(r => r.getAs[String]("w0") -> r.getAs[String]("w")).toMap
    val m = (0xE000).toChar
    assert(out("aaaa") === s"$m${m}_")
    assert(out("aaa") === s"${m}a_")
  }

  test("pair counting is overlapping (Sennrich get_stats): aaa counts " +
    "(a,a) twice per occurrence") {
    val words = Seq(("aaa", "aaa", 5L)).toDF("w0", "w", "f")
    val (merges, _) = Bpe.train(words, 1)
    assert(merges(0).pairCount === 10L)
  }

  test("train is deterministic and stops when no pairs remain") {
    val words = Seq(("ab", "ab", 3L)).toDF("w0", "w", "f")
    // round 0 merges (a,b) -> single symbol; round 1 has zero pairs
    val (merges, _) = Bpe.train(words, 5)
    assert(merges.map(m => (m.lhs, m.rhs, m.pairCount)) ===
      Seq(("a", "b", 3L)))
  }

  test("driver and distributed training paths agree merge-for-merge and " +
    "on the final vocab (driverMaxVocab=0 forces the distributed loop)") {
    val wc = Bpe.wordCounts(corpus, "text")
    val (mDrv, vDrv) = Bpe.train(wc, 6) // tiny vocab -> driver path
    val (mDist, vDist) = Bpe.train(wc, 6, driverMaxVocab = 0L)
    assert(mDrv === mDist)
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("w0"), r.getAs[Long]("f"),
        r.getAs[String]("w"))).toSet
    assert(tbl(vDrv) === tbl(vDist))
  }

  test("encodeStats: n_bpe shrinks toward n_words as merges grow; " +
    "0 merges means chars+marker per word") {
    val zero = Bpe.encodeStats(corpus, "doc_id", "text", nMerges = 0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_bpe"))).toMap
    // doc 1: 10 words, chars = 5*3 + 2*5 + 3*6 = 43, bpe = chars + markers
    assert(zero(1L) === ((10L, 43L, 53L)))
    val many = Bpe.encodeStats(corpus, "doc_id", "text", nMerges = 16)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_bpe")).toMap
    assert(many(1L) < zero(1L)._3)
    assert(many(1L) >= 10L) // can never go below one symbol per word
  }

  test("oracle SQL generator emits one expansion CTE per round and the " +
    "round count parameterizes both queries") {
    val sql = BpeSql.mergesSql(3)
    assert(sql.contains("m0 AS") && sql.contains("m2 AS") &&
      !sql.contains("m3 AS"))
    assert(sql.contains("chr(57344)") && sql.contains("chr(57346)"))
    assert(BpeSql.encodeSql(2).contains("FROM v2"))
  }
}
