package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage control for ITERATIVE dataframe loops (connected components,
  * BFS, PageRank): `Dataset.localCheckpoint(eager = true)` truncates the
  * logical plan but the returned `LogicalRDD` still carries origin
  * statistics/constraint references into the next round's plan, and
  * chaining ~17+ checkpointed rounds makes EVERY phase of the following
  * rounds (analysis, optimization, physical planning, execution) slow
  * down ~2× per round — measured on a 2k-node / 39k-edge component loop:
  * rounds 1-16 ≈ 0.3 s, round 22 ≈ 29 s, 55 s total, with plan size, row
  * count, partition count, and job/stage/task counts all CONSTANT.
  * Reliable `checkpoint(true)` and `spark.sql.constraintPropagation
  * .enabled=false` do NOT cure it; rebuilding a bare DataFrame over the
  * checkpointed RDD does (same loop: every round ≈ 0.25 s, 7 s total).
  */
object Lineage {

  /** Materialize `df` and return an equivalent DataFrame whose plan is a
    * bare scan over the locally-checkpointed rows — no logical-plan,
    * stats, or constraint reference to how the rows were produced.
    *
    * The blocks are cached as external `Row`s (one InternalRow↔Row
    * conversion per write+read), an O(rows) cost per round of the same
    * order as the iteration's own joins — the constant-factor price of
    * keeping round N+1's planning cost independent of N. On a cluster
    * where executor loss mid-loop matters, swap the RDD localCheckpoint
    * for a reliable checkpoint dir; the wrapping stays the same.
    */
  def flatCheckpoint(df: DataFrame): DataFrame = {
    val r = df.rdd
    r.localCheckpoint()
    r.count() // materializes the blocks and truncates the RDD lineage
    df.sparkSession.createDataFrame(r, df.schema)
  }
}
