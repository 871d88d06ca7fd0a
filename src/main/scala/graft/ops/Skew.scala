package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers for hot-key aggregations and joins.
  *
  * AQE handles skew for sort-merge JOINs at runtime, but a groupBy whose hot
  * key overwhelms one reducer needs salting: aggregate in two stages —
  * partial over (key, salt), final over key. Correct for any
  * decomposable aggregate; the helpers below cover the common sum/count/
  * min/max/avg set.
  */
object Skew {

  /** Two-stage salted aggregation. `partials` maps output column name to a
    * (partialAgg, finalAgg) pair, e.g.
    *   "n" -> (count(lit(1)), sum(col("n")))  // count = sum of partial counts
    *   "total" -> (sum(col("v")), sum(col("total")))
    *   "mx" -> (max(col("v")), max(col("mx")))
    * Stage 1 groups by keys + a uniform random-ish salt derived from a hash
    * of the full row identity (deterministic given the input), stage 2
    * re-aggregates the (at most saltFactor) partial rows per key.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      partials: Seq[(String, (Column, Column))],
      saltFactor: Int = 16,
      saltSource: Option[Column] = None
  ): DataFrame = {
    val salt = pmod(
      saltSource.map(hash(_)).getOrElse(spark_partition_id()),
      lit(saltFactor)
    ).as("__salt")
    val stage1 = df
      .withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (p, _)) => p.as(n) }: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._2._2.as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f.as(n) }: _*)
  }

  /** Salted average: carries (sum, count) through the salt stage. */
  def saltedAvg(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltFactor: Int = 16
  ): DataFrame =
    saltedAggregate(df, keys, Seq(
      "__sum" -> (sum(col(valueCol)), sum(col("__sum"))),
      "__cnt" -> (count(col(valueCol)), sum(col("__cnt")))
    ), saltFactor)
      .withColumn(s"avg_$valueCol", col("__sum") / col("__cnt"))
      .drop("__sum", "__cnt")

  /** Salted broadcast-replicated join for a skewed LEFT key joining a small
    * right side: replicate the right side saltFactor times, salt the left,
    * join on (key, salt) — spreads one hot key over saltFactor tasks.
    */
  def saltedJoinSmallRight(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int = 16
  ): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id(), lit(saltFactor)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(broadcast(replicatedRight), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Bloom-pruned equi-join: semi-filter the BIG side against a broadcast
    * Bloom bit table of the small side's join keys BEFORE the shuffle —
    * the classic 100 TB move when the small side is too large to
    * broadcast-join outright but its key set compresses to a few KB of
    * bits. No false negatives (a member's bits are all set by
    * construction), so the result EQUALS the plain join — false positives
    * just ride through and fall out of the equi-join itself.
    *
    * Shape: the small side's distinct keys fold to ≤ k·distinct bit rows,
    * packed into ONE sorted-array row and broadcast; the big side gets a
    * per-row k-probe filter (fold over array membership, no exchange, no
    * distinct) ahead of its join exchange — at 0.1% selectivity that is
    * 1000× less data shuffled. [[graft.ops.Sketch.bloomBits]] is the same
    * bit family, shardable/mergeable for incremental builds.
    */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      k: Int = 4,
      mBits: Int = 1 << 14
  ): DataFrame = {
    val bits = Sketch.bloomBits(small.select(col(smallKey)), smallKey, k, mBits)
    val packed = broadcast(bits.agg(array_sort(collect_list(col("bit"))).as("__bits")))
    val kHit = (0 until k)
      .map(i => array_contains(col("__bits"),
        Sketch.slice32Public(md5(col(bigKey).cast("string")), lit(i)) % mBits))
      .reduce(_ && _)
    big
      .crossJoin(packed)
      .filter(kHit)
      .drop("__bits")
      .join(small, col(bigKey) === small(smallKey))
  }
}
