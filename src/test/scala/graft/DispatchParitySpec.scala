package graft

/** Small-input vs scale-path VALUE parity for the round-14 size dispatches
  * (the GraphSpec driver-vs-distributed treatment, applied to the new
  * gates): each gated query runs once with the default small-input gate
  * firing and once with the gate conf forced to 0 (the 100 TB plan the
  * snapshot pins), and the collected, sorted outputs must be IDENTICAL —
  * the dispatch is a cost choice, never a semantics choice.
  */
class DispatchParitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(
      q: String, confs: Map[String, String]): Seq[String] = {
    val sess = spark.newSession()
    confs.foreach { case (k, v) => sess.conf.set(k, v) }
    SparkEntry.queries(q)(sess, sfDir)
      .collect().map(_.toString).sorted.toSeq
  }

  test("rel_hdr_quantiles: corpus-window exact path == bucket-confined " +
    "scale path") {
    val small = rows("rel_hdr_quantiles", Map.empty)
    val scale = rows("rel_hdr_quantiles",
      Map("spark.graft.hdr.windowExactMaxBytes" -> "0"))
    assert(small == scale)
    assert(small.nonEmpty)
  }

  test("doc_setsim_join: spread gram build + broadcast verify == " +
    "unspread scale plan") {
    val small = rows("doc_setsim_join", Map.empty)
    val scale = rows("doc_setsim_join",
      Map(graft.ops.Spread.MaxBytesConf -> "0"))
    assert(small == scale)
    assert(small.nonEmpty)
  }

  test("doc_bloom_contamination: spread gram build == unspread scale plan") {
    val small = rows("doc_bloom_contamination", Map.empty)
    val scale = rows("doc_bloom_contamination",
      Map(graft.ops.Spread.MaxBytesConf -> "0"))
    assert(small == scale)
    assert(small.nonEmpty)
  }
}
