package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data builder: replicate an sf directory `factor`× with
  * per-replica key offsets, producing a larger dataset of the SAME
  * distributional shape — 10× sf0.1 ≈ sf1 — so the bench can measure the
  * sf0.1→sf1 time slope of the expensive queries (the 100 TB scaling
  * argument as a number, not just a plan audit; results in SCALE.md).
  *
  * Scaling direction is ENTITY COUNT, not entity size: each replica
  * shifts every join/series/doc key by `k·10^7`, so there are 10× the
  * orders, users, docs, and vectors with unchanged per-entity structure
  * — the direction a growing corpus actually takes, and the one the
  * per-key partitioning design must absorb.
  *
  * Content decorrelation (replica 0 is the identity copy):
  *   - `documents.text`: every token gets a replica suffix (`word` →
  *     `word_k`), so replicas share ZERO tokens/shingles — near-dup and
  *     set-similarity blocking must not find cross-replica candidates
  *     (10 identical copies of each doc would grow candidate PAIRS
  *     quadratically and measure the fixture, not the engine). Token
  *     counts, lengths, and per-doc structure are preserved.
  *   - `embeddings.embedding`: cyclic dimension shift by `k` — norms and
  *     pairwise-distance distribution preserved, cross-replica
  *     neighborhoods decorrelated.
  *   - `events`: same time range, 10× the users (series count scales,
  *     per-series length stays — the per-key window design's claim).
  *
  * Usage: scripts/run.sh graft.ScaleUp /root/testdata/sf0.1 target/sf1 10
  */
object ScaleUp {
  private val Off = 10000000L // key offset per replica; >> any sf0.1 key

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, keys: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val base = Queries.table(spark, srcDir, name)
      // replica key ranges [k·Off, (k+1)·Off) must be disjoint: a source
      // key >= Off (e.g. running ScaleUp on its own output) would silently
      // collide replicas and corrupt every slope/sweep built on the data —
      // fail loudly instead (round-7 advisor)
      keys.foreach { c =>
        val mx = base.agg(max(col(c).cast("long"))).head().getLong(0)
        require(mx >= 0 && mx < Off,
          s"$name.$c max=$mx outside [0, $Off): replica ranges would collide")
      }
      val out = (0 until factor).map(k => perReplica(base, k))
        .reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scaleup] $name x$factor -> $outDir")
    }

    def shift(c: String, k: Int) = col(c) + lit(k * Off)

    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), (df, k) => df
      .withColumn("l_orderkey", shift("l_orderkey", k))
      .withColumn("l_partkey", shift("l_partkey", k))
      .withColumn("l_suppkey", shift("l_suppkey", k)))
    replicate("orders", Seq("o_orderkey", "o_custkey"), (df, k) => df
      .withColumn("o_orderkey", shift("o_orderkey", k))
      .withColumn("o_custkey", shift("o_custkey", k)))
    replicate("customer", Seq("c_custkey"), (df, k) => df
      .withColumn("c_custkey", shift("c_custkey", k)))
    replicate("supplier", Seq("s_suppkey"), (df, k) => df
      .withColumn("s_suppkey", shift("s_suppkey", k)))
    replicate("part", Seq("p_partkey"), (df, k) => df
      .withColumn("p_partkey", shift("p_partkey", k)))
    replicate("events", Seq("event_id", "user_id"), (df, k) => df
      .withColumn("event_id", shift("event_id", k))
      .withColumn("user_id", shift("user_id", k)))
    replicate("documents", Seq("doc_id"), (df, k) => {
      // replica suffix is ALPHANUMERIC (`z3`, not `_3`): '_' is
      // [[:punct:]] in DuckDB but not a word-char boundary in every
      // engine's classes, and the 1-in-a-million quality-score drift it
      // caused was the only sf1 oracle mismatch in the round-7 probe
      val txt = if (k == 0) col("text")
      else regexp_replace(col("text"), "(\\S+)", s"$$1z$k")
      df.withColumn("doc_id", shift("doc_id", k))
        .withColumn("text", txt)
        .withColumn("n_chars", length(txt).cast("long"))
    })
    replicate("embeddings", Seq("vec_id"), (df, k) => {
      // cyclic shift + per-replica sign flips: BOTH are orthogonal, so
      // norms and within-replica pairwise distances are preserved, while
      // cross-replica projections (e.g. the DBSCAN top-PC plane)
      // decorrelate — without the flips all replicas project to the SAME
      // 2-D points, stacking density 10x and candidate pairs 100x (the
      // fixture would measure its own degeneracy, not the engine)
      val vec = if (k == 0) col("embedding")
      else transform(
        concat(slice(col("embedding"), k + 1, 100000),
          slice(col("embedding"), 1, k)),
        (x, i) => when((i + lit(k)) % 3 === 0, -x).otherwise(x))
      df.withColumn("vec_id", shift("vec_id", k))
        .withColumn("embedding", vec)
    })
    // dimension tables copied verbatim (region/nation are constants)
    Seq("region", "nation").foreach { name =>
      spark.read.parquet(s"$srcDir/$name.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    spark.stop()
  }
}
