package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism repair for small unsplittable inputs (guide §2.5
  * "input skew: one huge unsplittable file … repartition immediately after
  * the read").
  *
  * Why it exists: a parquet file is splittable only at row-group
  * boundaries, so a table written as one file with one row group scans as
  * ONE task no matter the core count — and every CPU-heavy map pass
  * downstream of it (tokenize + md5-per-gram, minhash banding, quality
  * classifiers) runs single-threaded. Measured at sf0.1/local[32]: the
  * setsim gram build is 0.65 s single-task vs ~0.1 s spread; the whole
  * 8↔32-core bench scaling block sat at ≈1.0 because of this. An explicit
  * repartition after the read is the only remedy (no files.* conf can
  * split inside a row group).
  *
  * Why it is GATED on input size: the repartition shuffles the raw rows
  * (text payloads included), which is only sane while the input is small —
  * exactly the regime where the scan has too few splits. A big input
  * (100 TB) has thousands of row groups and natural parallelism, so the
  * gate leaves the plan untouched there; the exchange this helper adds is
  * strictly a small-input artifact, not a scale-path cost. The threshold
  * is `spark.graft.spread.maxInputBytes` (default 1 GiB — at most one
  * ~seconds-scale shuffle, against map passes that are otherwise
  * single-task minutes); the size read is the optimizer's scan estimate
  * (file bytes scaled by column pruning), available without running a job.
  *
  * Determinism: callers pass the row's natural key (doc_id, vec_id…) so
  * the exchange is a plain deterministic hash partitioning — no
  * round-robin, no sort-before-repartition pass, and retried tasks
  * reproduce the same placement (guide §2.5's SPARK-38388 note).
  */
object Spread {

  val MaxBytesConf = "spark.graft.spread.maxInputBytes"
  val DefaultMaxBytes: Long = 1L << 30

  /** The session's shuffle width — the same knob every other operator in
    * this library sizes explicit exchanges with.
    */
  private def nPart(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** True iff `df`'s planned input is at or under the spread gate —
    * shared by callers that hang OTHER small-input choices (e.g. a
    * broadcast of a derived table) off the same size regime.
    */
  def isSmall(df: DataFrame): Boolean = {
    if (df.isStreaming) return false // micro-batches claim their own width
    val maxBytes = df.sparkSession.conf
      .get(MaxBytesConf, DefaultMaxBytes.toString).toLong
    df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes
  }

  /** Hash-repartition `df` across the session shuffle width when (and only
    * when) its planned input is small enough that the scan cannot have
    * claimed that parallelism itself. Identity past the gate.
    */
  def byKey(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "pass the row's natural key columns")
    if (isSmall(df)) df.repartition(nPart(df), keys: _*) else df
  }
}
