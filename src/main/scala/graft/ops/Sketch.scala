package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size distributed sketches: Count-Min (frequency), Bloom filter
  * (membership), HyperLogLog (cardinality).
  *
  * These are the summaries that make 100 TB corpus statistics tractable:
  * each one compresses an unbounded key stream into a table whose size is a
  * CONSTANT of the sketch parameters (d·w counters, m bits, m registers) —
  * so the sketch itself always broadcasts, and the only shuffle is the
  * map-side-combined partial aggregation that builds it. Probing is a
  * broadcast join; no probe-side shuffle beyond the caller's own grouping.
  *
  * All three use the portable 60-bit md5 hash family shared with
  * [[Dedup]]/[[Corpus]], so every register, bucket, and bit — and therefore
  * every estimate — replays exactly in ANSI SQL: the oracle checks the
  * sketch VALUES, not just plausibility. Estimates stay in exact integer
  * arithmetic (or single IEEE ops over exactly-representable operands), so
  * cross-engine comparison is bit-precise.
  *
  * Reference scope: the reference engine has no sketches (single-node
  * pandas never needs them); these are the scale-path extension the brief
  * calls for, same spirit as `time_series_loader`'s validation reports —
  * cheap corpus-wide summaries that gate expensive passes.
  */
object Sketch {

  /** Portable 60-bit hash: low 60 bits of md5, tag-separated per family
    * member. Same idiom as [[Corpus.pctBucket]] / MinHash.
    */
  private[graft] def h60(tag: Column, x: Column): Column =
    conv(substring(md5(concat_ws("|", tag, x.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** The CMS/Bloom hash family: the i-th member (i < 4) is the i-th 32-bit
    * slice of ONE md5 digest (hex chars 8i+1..8i+8) — one digest per key
    * serves all rows/positions (Kirsch-Mitzenmacher-style derived hashing;
    * md5 avalanche makes the slices independent). Measured 2.3× faster
    * than a tagged digest per member at sf0.1.
    */
  private def slice32(digest: Column, i: Column): Column =
    conv(digest.substr(i * 8 + 1, lit(8)), 16, 10).cast("long")

  /** [[slice32]] for sibling ops that reuse the bit family (the bloom-
    * pruned join probes the same positions [[bloomBits]] set).
    */
  private[ops] def slice32Public(digest: Column, i: Column): Column =
    slice32(digest, i)

  // ===================== Count-Min sketch ==================================

  /** Build a Count-Min sketch over one row per key OCCURRENCE: returns
    * `(r, bucket, cnt)` — at most `depth·width` rows no matter how large
    * the input. Point estimates are upper bounds (`cmsLookup` takes the
    * min over rows), never undercounts.
    *
    * Scale shape: the only wide op is the groupBy on `(r, bucket)` —
    * bounded key space, map-side combine collapses each partition to
    * ≤ d·w rows before the exchange.
    */
  def cmsBuild(
      df: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    require(depth > 0 && depth <= 4,
      "depth must be 1..4 (rows are 32-bit slices of one md5)")
    require(width > 0, "width must be positive")
    df.select(md5(col(keyCol).cast("string")).as("__h"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("__h"))
      .select(col("r"), (slice32(col("__h"), col("r")) % width).as("bucket"))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[cmsBuild]] over a PRE-AGGREGATED `(key, count)` table: one md5 per
    * DISTINCT key instead of one per occurrence, bucket counts summed by
    * the carried weight. Identical output to `cmsBuild` on the raw
    * occurrence rows (the bucket is a function of the key alone), at
    * 1/avg-multiplicity of the hash work and exploded-row volume —
    * guide §2.3 "aggregate before you shuffle" applied to the sketch
    * build. Kept separate from `cmsBuild` because that one also runs as
    * a single stateful aggregation over streams (SketchSpec pins it);
    * chaining a per-key pre-aggregate there would break append-mode
    * streaming support.
    */
  def cmsBuildWeighted(
      df: DataFrame,
      keyCol: String,
      cntCol: String,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    require(depth > 0 && depth <= 4,
      "depth must be 1..4 (rows are 32-bit slices of one md5)")
    require(width > 0, "width must be positive")
    df.select(md5(col(keyCol).cast("string")).as("__h"),
        col(cntCol).cast("long").as("__n"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("__h"),
        col("__n"))
      .select(col("r"), (slice32(col("__h"), col("r")) % width).as("bucket"),
        col("__n"))
      .groupBy("r", "bucket")
      .agg(sum(col("__n")).as("cnt"))
  }

  /** Point-estimate the count of each probe key: min over the sketch's
    * `depth` rows. Missing buckets count 0 (key never seen). The sketch is
    * broadcast — probes never shuffle. Output: `(keyCol, cms_est)`.
    */
  def cmsLookup(
      sketch: DataFrame,
      probes: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame =
    probes
      .select(col(keyCol), md5(col(keyCol).cast("string")).as("__h"))
      .select(col(keyCol), col("__h"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col(keyCol), col("r"),
        (slice32(col("__h"), col("r")) % width).as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** Join-size estimation by CMS inner product (the AGMS/CMS classic the
    * planner-statistics literature uses): for two relations sketched on
    * their join key with the SAME (depth, width) family,
    * `est = min_r Σ_bucket cntA[r][b]·cntB[r][b]` upper-bounds — and with
    * enough width approaches — `|A ⋈ B|`. Cost: joining two d×w counter
    * tables (broadcast the smaller), independent of either relation's
    * size; the pre-shuffle cardinality check a pipeline runs before
    * committing to an expensive join. Output: one row, `(join_size_est)`.
    */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("r"), col("bucket"), col("cnt").as("__ca"))
      .join(broadcast(b.select(col("r"), col("bucket"), col("cnt").as("__cb"))),
        Seq("r", "bucket"))
      .groupBy("r")
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .agg(min(col("__ip")).as("join_size_est"))

  // ===================== Bloom filter ======================================

  /** Set-bit table of a Bloom filter over the distinct keys: `k` md5-family
    * positions per key, ≤ `mBits` rows total — always broadcastable.
    */
  def bloomBits(
      keys: DataFrame,
      keyCol: String,
      k: Int = 4,
      mBits: Int = 1 << 14
  ): DataFrame = {
    require(k > 0 && k <= 4,
      "k must be 1..4 (positions are 32-bit slices of one md5)")
    require(mBits > 0, "mBits must be positive")
    keys
      .select(col(keyCol).cast("string").as("__k"))
      .distinct()
      .select(explode(sequence(lit(0), lit(k - 1))).as("i"), md5(col("__k")).as("__h"))
      .select((slice32(col("__h"), col("i")) % mBits).as("bit"))
      .distinct()
  }

  /** [[bloomBits]]' set-position table packed into ONE dense
    * `array<long>` row (`__bwords`, mBits/64 entries, word w's bit b =
    * position 64w+b). Same md5-family positions, so membership verdicts
    * are bit-identical to probing the position list — but the probe
    * ([[bitsMightContain]]) becomes k O(1) word tests per row instead of
    * an explode + join + re-agg of the probe stream (round 13, guide
    * §2.4: the position-list probe paid a distinct exchange, a 4× row
    * explode, and a groupBy exchange per probe set).
    */
  def bloomBitsWords(bits: DataFrame, mBits: Int = 1 << 14): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    val set = bits
      .select(expr("CAST(bit div 64 AS BIGINT)").as("__word"),
        expr("shiftleft(1L, CAST(bit % 64 AS INT))").as("__mask"))
      .groupBy("__word").agg(expr("bit_or(__mask)").as("__mask"))
    bits.sparkSession.range((mBits / 64).toLong)
      .select(col("id").as("__word"))
      .join(set, Seq("__word"), "left")
      .select(col("__word"), coalesce(col("__mask"), lit(0L)).as("__mask"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(__word, __mask)))," +
          " s -> s.__mask)").as("__bwords"))
  }

  /** The k-probe membership predicate against a [[bloomBitsWords]] table
    * column: true iff all k md5-family positions are set. Positions are
    * IDENTICAL to [[bloomBits]]/the legacy list probe (slice32 of one
    * md5 per key, mod mBits), so verdicts — including false positives —
    * are bit-for-bit the same; k and mBits must match the build.
    */
  def bitsMightContain(
      keyExpr: Column,
      wordsCol: Column,
      k: Int = 4,
      mBits: Int = 1 << 14
  ): Column = {
    require(k > 0 && k <= 4,
      "k must be 1..4 (positions are 32-bit slices of one md5)")
    val digest = md5(keyExpr.cast("string"))
    (0 until k)
      .map { i =>
        val pos = slice32(digest, lit(i)) % mBits
        // pos < mBits <= 2^31, so the double division is exact and the
        // cast truncates to the word index; element_at is 1-based
        val word = element_at(wordsCol, (pos / lit(64L)).cast("int") + lit(1))
        call_function("shiftright", word, pmod(pos, lit(64L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)
  }

  /** Membership verdict per distinct probe key: `bloom_hit` is true iff all
    * `k` positions are set. No false negatives ever (a member's bits are
    * all set by construction); false-positive rate ≈ (set fraction)^k.
    * The packed bit table is broadcast; the probe side's only exchange is
    * the distinct. Output: `(keyCol, bloom_hit)`.
    */
  def bloomProbe(
      probes: DataFrame,
      keyCol: String,
      bits: DataFrame,
      k: Int = 4,
      mBits: Int = 1 << 14
  ): DataFrame =
    probes
      .select(col(keyCol))
      .distinct()
      .crossJoin(broadcast(bloomBitsWords(bits, mBits)))
      .select(col(keyCol),
        bitsMightContain(col(keyCol), col("__bwords"), k, mBits)
          .as("bloom_hit"))

  /** Dense packed-word Bloom filter over LONG keys, built distributed:
    * one row holding `array<long>` of `mBits/64` words, each the bit-OR
    * of its members' masks. This is the representation for MULTI-MILLION
    * key sets where [[bloomBits]]' set-position list (linear-scan
    * `array_contains` probe, position-count-bounded) stops working: the
    * probe below is O(1) per hash via `element_at` word indexing, and the
    * table is `mBits/8` bytes regardless of key count — 8 bits/key · k=3
    * gives ~3% FPR, so ~120 MB covers 10^8 keys.
    *
    * Positions are `pmod(xxhash64(key, i), mBits)` — xxhash64 is
    * codegen'd and ~ns per eval, which matters because the intended
    * probe side is a generated stream (e.g. triangle wedges) several
    * orders larger than the key set; an md5-family position would own
    * the whole stage there.
    *
    * Build shape: distinct keys → k position rows → word/mask → one
    * map-side-combined bit-OR groupBy on word index → dense left-join
    * against `range(nWords)` → ONE collect_list row (bounded by
    * `mBits/64` longs, the broadcastability condition the caller chose
    * via mBits). `mBits` must be a positive multiple of 64.
    */
  def bloomWords(
      keys: DataFrame,
      keyCol: String,
      k: Int = 3,
      mBits: Long = 1L << 20,
      assumeDistinct: Boolean = false
  ): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be 1..8, got $k")
    require(mBits > 0 && mBits % 64 == 0 && mBits / 64 <= Int.MaxValue.toLong,
      s"mBits must be a positive multiple of 64 with < 2^31 words, got $mBits")
    val nWords = (mBits / 64L).toInt
    val spark = keys.sparkSession
    val keyed = keys.select(col(keyCol).cast("long").as("__key"))
    // repartition the RAW mask rows by word BEFORE the bit-OR: hash
    // positions are uniform, so a map-side partial agg touches ~every
    // word per task — its hash table is nWords-sized PER TASK and spills
    // (32 GB at the sf10 triangle probe: 34 tasks x 15M words), while
    // compressing nothing. Shuffling the k·|keys| small rows raw and
    // aggregating post-partition bounds each task at nWords/nPart groups.
    val nPart = keys.sparkSession.sessionState.conf.numShufflePartitions
    val set = (if (assumeDistinct) keyed else keyed.distinct())
      .select(col("__key"), explode(sequence(lit(0), lit(k - 1))).as("__i"))
      .select(pmod(xxhash64(col("__key"), col("__i")), lit(mBits)).as("__pos"))
      .select(expr("CAST(__pos div 64 AS BIGINT)").as("__word"),
        expr("shiftleft(1L, CAST(__pos % 64 AS INT))").as("__mask"))
      .repartition(nPart, col("__word"))
      .groupBy(col("__word"))
      .agg(expr("bit_or(__mask)").as("__mask"))
    spark.range(nWords.toLong).select(col("id").as("__word"))
      .join(set, Seq("__word"), "left")
      .select(col("__word"), coalesce(col("__mask"), lit(0L)).as("__mask"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(__word, __mask)))," +
          " s -> s.__mask)").as("__words"))
  }

  /** The k-probe membership predicate against a [[bloomWords]] table
    * column (`wordsCol` = the `array<long>`): true iff all k positions'
    * bits are set. Same xxhash64 position family as the build — k and
    * mBits MUST match the build call. No false negatives by
    * construction; use ahead of an equi-join so false positives fall out
    * of the join itself. The probe key is cast to long HERE to mirror
    * the build's cast: xxhash64 is type-width-sensitive, so probing an
    * int/decimal column against a long-built table without the cast
    * would silently miss every member.
    */
  def wordsMightContain(
      keyExpr: Column,
      wordsCol: Column,
      k: Int = 3,
      mBits: Long = 1L << 20
  ): Column =
    (0 until k)
      .map { i =>
        val pos = pmod(xxhash64(keyExpr.cast("long"), lit(i)), lit(mBits))
        // pos < 2^37 (mBits bound), so the double division is exact and
        // the cast truncates to the word index; element_at is 1-based
        val word = element_at(wordsCol, (pos / lit(64L)).cast("int") + lit(1))
        // the Scala-API shiftright only takes a literal shift; the SQL
        // function form takes expressions
        call_function("shiftright", word, pmod(pos, lit(64L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)

  // ===================== merge algebra =====================================

  /** Sketches merge by pure algebra — counts ADD, registers MAX, bits
    * UNION — which is exactly what makes them shardable: build per
    * partition / file / day / micro-batch, merge the constant-size
    * summaries, never re-touch the data. The merge of per-shard sketches
    * EQUALS the sketch of the union (exact table equality, spec-pinned),
    * so a 100 TB build is embarrassingly parallel and a streaming build is
    * just a running merge (the groupBys in [[cmsBuild]]/[[hllRegisters]]
    * ARE valid streaming stateful aggregations — spec-pinned too).
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "bucket").agg(sum("cnt").as("cnt"))

  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("m_j").as("m_j"))

  // ===================== HyperLogLog =======================================

  /** m = 64 registers (p = 6). Small on purpose: the register table per
    * group is 64 rows, the harmonic sum fits int64 exactly, and ±13%
    * standard error is plenty for corpus-scale distinct gating.
    */
  val HllM = 64
  private val HllRhoMax = 55 // 60-bit hash minus 6 bucket bits, + 1

  /** alpha_64 = 0.7213/(1+1.079/64) in micro-units (exact int constant). */
  private val HllAlphaU = 709340L
  /** round(ln(64)·1e6) — micro-nat constant for the linear-counting branch. */
  private val HllLnUM = 4158883L

  /** HLL registers per group: `(groupCols…, bucket, m_j)` where `m_j` is
    * the max leading-zero rank observed in the bucket. ≤ 64 rows per group;
    * the groupBy partial-aggregates map-side (max combines).
    */
  def hllRegisters(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String]
  ): DataFrame = {
    val h = h60(lit("hll"), col(keyCol))
    // rho = leading zeros of the remaining 54 bits + 1 = 55 - bit_length;
    // bin() of a positive long is its minimal binary string, so
    // bit_length = length(bin(rest)) — exact integers end to end
    val rest = expr("shiftrightunsigned(__h, 6)")
    df.select((groupCols.map(col) :+ h.as("__h")): _*)
      .select((groupCols.map(col) :+ (col("__h") % HllM).as("bucket") :+
        when(rest === 0, HllRhoMax)
          .otherwise(lit(HllRhoMax) - length(bin(rest))).cast("int").as("__rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("__rho")).as("m_j"))
  }

  /** Cardinality estimate per group from [[hllRegisters]] output.
    *
    * Exactness contract: the harmonic denominator
    * `S = Σ_j 2^(55 − M_j)` (absent buckets contribute `2^55`) is an EXACT
    * int64 (≤ 64·2^55 = 2^61). The raw estimate
    * `est_u = floor(alpha_u·m²·2^55 / S)` (micro-docs) is computed as one
    * IEEE multiply of two exactly-representable doubles, one divide, one
    * floor — identical bit pattern on any IEEE engine. The small-range
    * (linear-counting) branch `m·ln(m/V)` uses micro-nat-snapped integer
    * logs. Output: `(groupCols…, v_zero, harmonic_s, est_u, hll_est)`.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped = registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - m_j)")).as("__sp"))
    val s = col("__sp") + (lit(HllM.toLong) - col("__present")) * lit(1L << HllRhoMax)
    val vZero = (lit(HllM) - col("__present")).cast("int")
    // alpha_u·m² = 2905456640 < 2^32 and 2^55 are both exact doubles: the
    // product is ONE correctly-rounded IEEE op, engine-independent
    val rawU = floor(
      (lit((HllAlphaU * HllM * HllM).toDouble) * lit((1L << HllRhoMax).toDouble)) /
        s.cast("double"))
      .cast("long")
    val lcU = lit(HllM.toLong) *
      (lit(HllLnUM) - round(log(vZero.cast("double")) * 1e6, 0).cast("long"))
    val estU = when(vZero > 0 && rawU < lit(2500000L) * HllM, lcU).otherwise(rawU)
    grouped
      .select(
        (groupCols.map(col) :+ vZero.as("v_zero") :+ s.as("harmonic_s") :+
          estU.as("est_u")): _*)
      .withColumn("hll_est", expr("est_u div 1000000"))
  }
}
