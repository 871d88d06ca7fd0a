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
    * Shape: the small side's distinct keys fold to a DENSE packed-word
    * bit table ([[graft.ops.Sketch.bloomWords]] — mBits/8 bytes in ONE
    * broadcast row); the big side gets a per-row k-probe filter (O(1)
    * word-index + mask per probe, xxhash64 positions — no exchange, no
    * distinct) ahead of its join exchange — at 0.1% selectivity that is
    * 1000× less data shuffled.
    *
    * (Round 13, guide §3.2/§4: the previous form probed a sorted
    * set-bit LIST via `array_contains` — an O(set bits) linear scan per
    * probe, k of them per big-side row, behind an md5-of-string position
    * family. At sf0.1 that put rel_bloom_join at 3.2 s for a 600k-row
    * probe side; the packed-word + xxhash64 form is the same kernel the
    * triangle counter already uses. Result is unchanged by construction:
    * no false negatives for ANY position family, false positives fall
    * out of the equi-join — SkewSpec pins output == plain join.)
    *
    * Keys are canonicalized before hashing (both sides to long when both
    * are integral, else both to string) so equal join keys hash equal
    * even when the two sides' column types differ in width.
    */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      k: Int = 4,
      mBits: Int = 1 << 14
  ): DataFrame = {
    import org.apache.spark.sql.types._
    require(k >= 1 && k <= 8, s"k must be 1..8, got $k")
    require(mBits > 0, s"mBits must be positive, got $mBits")
    val mB: Long = ((mBits.toLong + 63L) / 64L) * 64L
    val integral = Seq(big.schema(bigKey).dataType,
      small.schema(smallKey).dataType).forall {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def keyed(c: Column): Column =
      xxhash64(if (integral) c.cast("long") else c.cast("string"))
    val words = broadcast(Sketch.bloomWords(
      small.select(keyed(col(smallKey)).as("__k")), "__k", k, mB))
    big
      .crossJoin(words)
      .filter(Sketch.wordsMightContain(keyed(col(bigKey)), col("__words"),
        k, mB))
      .drop("__words")
      .join(small, col(bigKey) === small(smallKey))
  }
}
