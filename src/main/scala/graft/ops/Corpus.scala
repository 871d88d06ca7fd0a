package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline needs
  * beyond dedup/quality: deterministic dataset splitting, repetition
  * analysis, PII redaction, and benchmark-contamination detection.
  *
  * All per-row work is codegen'd column algebra (no UDFs); the one join
  * (contamination) broadcasts the benchmark n-gram set — at 100 TB the
  * train side streams through map-side, nothing wide shuffles.
  */
object Corpus {

  // ===== deterministic split ===============================================

  /** Percentile bucket in [0, 100) from the md5 of the content — stable
    * across runs, clusters, and engines (md5 hex is the cross-engine
    * contract; xxhash64 would be Spark-only). Splitting on CONTENT (not id)
    * keeps exact duplicates in the same split so they can't leak
    * train -> test.
    */
  def pctBucket(content: Column): Column =
    conv(substring(md5(content), 1, 8), 16, 10).cast("long") % 100

  /** train/val/test assignment by content hash: [0,trainPct) -> train,
    * [trainPct, trainPct+valPct) -> val, rest -> test.
    */
  def splitAssign(content: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val pct = pctBucket(content)
    when(pct < trainPct, "train")
      .when(pct < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic global shuffle into training shards: shard = md5 bucket
    * of (seed, id), position = rank of an INDEPENDENT md5 substring within
    * the shard (ties by id). Together they give every row a stable,
    * pseudo-random (shard, pos) address — the "shuffle once, read
    * sequentially" layout training dataloaders want — reproducible across
    * runs, engines, and cluster sizes (no partition-id or RNG dependence).
    *
    * Shard and order draw on disjoint hex ranges of the same digest
    * (chars 17-24 vs 1-15), so within-shard order is uncorrelated with
    * shard choice. Scale: the assignment is a pure per-row projection; the
    * position is one window per shard, so size nShards so a shard fits a
    * task (the usual few-hundred-MB shard-file convention) — at 100 TB
    * that's tens of thousands of shards, which also keeps every executor
    * busy. Writing then partitions by the same column, reusing the shuffle.
    */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      seed: String = "shuf"
  ): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val digest = md5(concat_ws("|", lit(seed), col(idCol).cast("string")))
    df.withColumn("__ord", conv(substring(digest, 1, 15), 16, 10).cast("long"))
      .withColumn("shard",
        (conv(substring(digest, 17, 8), 16, 10).cast("long") % nShards))
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("__ord"), col(idCol)))
          - 1).cast("long"))
      .drop("__ord")
  }

  /** Materialize the deterministic shuffle as shard files: one directory
    * per shard, rows in within-shard shuffle order. Reuses
    * [[shardAssign]]'s single exchange — the window already hash-partitions
    * by shard and sorts by the order key, so the `partitionBy(shard)` write
    * splits files without a second shuffle, and each shard file's row order
    * IS the pos order a sequential dataloader reads.
    */
  def writeShards(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      path: String,
      seed: String = "shuf"
  ): Unit =
    shardAssign(df, idCol, nShards, seed)
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  // ===== repetition ========================================================

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Per-document repetition stats: token count, distinct tokens, and
    * repetition ratio (1 - distinct/total; 0 = no repetition). The
    * compression-proxy quality signal: templated/spammy text repeats.
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    // tokens materialized as a real column: HOF lambdas re-evaluate captured
    // subtrees per element, so size/array_distinct must not re-split
    val toks = df.withColumn("__toks", tokens(col(textCol)))
    toks
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("__toks"))).cast("long"))
      .withColumn("repetition_ratio",
        when(col("n_tokens") === 0, 0.0).otherwise(
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)))
      .drop("__toks")
  }

  // ===== PII redaction =====================================================

  /** RE2-safe patterns (no lookarounds/backrefs): identical semantics under
    * Java regex (Spark) and RE2 (DuckDB oracle, Go/Rust scanners).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern)).cast("long")

  /** Redact emails then phones (order matters: an email never contains a
    * phone match after replacement, the reverse can).
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"), PhonePattern, "<PHONE>")

  // ===== line-level dedup (boilerplate removal) ============================

  /** CCNet-style line-level deduplication: drop every line that occurs at
    * least `minCount` times across the corpus (navbars, cookie banners,
    * newsletter prompts — boilerplate repeats, prose doesn't).
    *
    * Scale shape: lines explode in the map stage; the count aggregate
    * combines map-side so the shuffle carries (line, partial_n) not raw
    * rows; the surviving FREQUENT set is tiny by construction (only text
    * repeated >= minCount times corpus-wide) and broadcasts, so the removal
    * pass over the full corpus is a map-side anti join. Per-doc reassembly
    * shuffles (doc_id, pos, line) once.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 5
  ): DataFrame = {
    val lines = df.select(
      col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val frequent = lines
      .groupBy("line").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select("line")
    val kept = lines
      .join(broadcast(frequent), Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("clean_text"))
    // docs whose every line was boilerplate drop out of the agg — restore
    // them with an empty clean_text so the output keeps one row per doc
    df.select(col(idCol), size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol), col("n_lines"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ===== stratified sampling (domain mixing) ===============================

  /** Fine-grained (1/10000) deterministic content-hash bucket — the
    * sampling twin of [[pctBucket]].
    */
  def bucket10k(content: Column): Column =
    conv(substring(md5(content), 1, 8), 16, 10).cast("long") % 10000

  /** Deterministic stratified sampling: keep a row when its content-hash
    * bucket falls under the stratum's rate (domain/language mixing for a
    * training corpus). Content-keyed like [[splitAssign]], so exact
    * duplicates sample identically, and re-runs are reproducible with no
    * RNG state. Pure per-row filter: zero shuffle at any scale.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      contentCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0
  ): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate * 10000)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(rate * 10000)).otherwise(acc)
    }
    df.filter(bucket10k(col(contentCol)) < threshold)
  }

  /** Temperature-rebalanced source mixing: sample each source s at a rate
    * that reshapes the corpus toward weights w_s ∝ n_s^alpha (alpha=1 keeps
    * natural proportions, alpha=0 equalizes sources, alpha in between is
    * the multilingual-training "temperature" upsampling-by-downsampling
    * trick). With target output fraction f of N total rows:
    *
    *   keep_s = min(1, f * N * w_s / n_s),  w_s = n_s^alpha / sum_t n_t^alpha
    *
    * Selection is the same deterministic content-hash bucket as
    * [[stratifiedSample]] — reproducible, duplicate-stable, RNG-free.
    *
    * Scale design: source counts are a map-side-combined groupBy producing
    * a #sources-row frame; rates are window algebra over that tiny frame,
    * broadcast-joined back. The corpus pass itself is a pure per-row
    * filter — zero shuffle of the data at any scale.
    */
  def mixtureSample(
      df: DataFrame,
      sourceCol: String,
      contentCol: String,
      alpha: Double,
      targetFraction: Double
  ): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n_s"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().orderBy(col(sourceCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // sum weights in sourceCol order so any engine replays the identical
    // IEEE addition sequence
    val rates = counts
      .withColumn("__w", pow(col("__n_s").cast("double"), alpha))
      .withColumn("__wsum", sum(col("__w")).over(wAll))
      .withColumn("__nsum", sum(col("__n_s")).over(wAll))
      .withColumn("__keep",
        least(lit(1.0),
          lit(targetFraction) * col("__nsum") * col("__w") /
            (col("__wsum") * col("__n_s"))))
      .select(col(sourceCol), col("__keep"))
    df.join(broadcast(rates), sourceCol)
      .filter(bucket10k(col(contentCol)) < col("__keep") * 10000)
      .drop("__keep")
  }

  /** Per-source document cap (Common-Crawl-style domain balancing): keep at
    * most `cap` docs per source, chosen as the `cap` SMALLEST md5-of-id
    * values — a deterministic uniform sample without replacement (the hash
    * is a random permutation of ids), reproducible with no RNG state and
    * stable under re-runs and corpus append-order changes.
    *
    * Scale shape: the ranking pass runs on a slim (source, hash, id)
    * projection — text never enters the sort — and the winners semi-join
    * back to the full rows. A mega-domain's per-source sort is a
    * spill-safe window over slim rows; when one domain truly dwarfs
    * memory, pre-prune with a hash threshold ≈ slack·cap/n_s (the exact
    * top-cap survives any threshold ≥ its cap-th order statistic, which a
    * per-source count check certifies) before ranking.
    */
  def capPerSource(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      cap: Int
  ): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(h, col(idCol))
    val keep = df.select(col(idCol), col(sourceCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ===== importance reweighting (DSIR) =====================================

  /** One row per n-gram OCCURRENCE (multiplicity kept — DSIR models the
    * feature distribution, so a repeated bigram counts twice), hashed into
    * `nBuckets` feature buckets via the portable md5 family so every count
    * is replayable by an independent SQL engine.
    */
  private def ngramBucketOccurrences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int,
      n: Int
  ): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val grams = when(size(col("__lt")) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("__lt")) - (n - 1)),
        i => concat_ws(" ", slice(col("__lt"), i, lit(n)))))
    df.select(col(idCol), toks.as("__lt"))
      .select(col(idCol), explode(grams).as("__g"))
      .select(col(idCol),
        (graft.ops.Dedup.portableHash64(col("__g")) % nBuckets).as("bucket"))
  }

  /** Per-bucket log-likelihood ratio `ln p_target(b) − ln p_raw(b)` with
    * Laplace smoothing, in integer micro-nats (each ln() is of an exact
    * integer and snapped independently, so the ratio is exact integer
    * arithmetic — the [[TextStats.tfIdf]] portability trick).
    *
    * Scale shape: both distributions are map-side-combined groupBys
    * collapsing to ≤ nBuckets rows; totals ride a broadcast one-row
    * cross join; the ratio table is bucket-sized and broadcastable.
    */
  def dsirLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int = 4096,
      n: Int = 2,
      complete: Boolean = false
  ): DataFrame = {
    def dist(df: DataFrame) =
      ngramBucketOccurrences(df, idCol, textCol, nBuckets, n)
        .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    def uln(c: Column): Column =
      round(log(c.cast("double")) * 1e6, 0).cast("long")
    val rc = dist(raw).withColumnRenamed("c", "c_r")
    val tc = dist(target).withColumnRenamed("c", "c_t")
    val rTot = rc.agg(sum(col("c_r")).as("nr"))
    val tTot = tc.agg(sum(col("c_t")).as("nt"))
    // `complete` emits one row per bucket, including buckets unseen in BOTH
    // corpora (their smoothed ratio is the nonzero constant
    // ln(1/(nt+B)) − ln(1/(nr+B))) — required when scoring NEW documents
    // whose grams may miss every training bucket
    val joined =
      if (complete)
        raw.sparkSession.range(nBuckets).select(col("id").as("bucket"))
          .join(rc, Seq("bucket"), "left").join(tc, Seq("bucket"), "left")
      else rc.join(tc, Seq("bucket"), "full_outer")
    joined
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("bucket"),
        ((uln(coalesce(col("c_t"), lit(0L)) + 1) - uln(col("nt") + nBuckets)) -
          (uln(coalesce(col("c_r"), lit(0L)) + 1) - uln(col("nr") + nBuckets)))
          .as("lr_u"))
  }

  /** Score ANY frame — batch or stream — against a frozen ratio table: the
    * complete ratio array (nBuckets longs) packs into ONE broadcast row and
    * every document's weight is a per-row integer fold over its grams. No
    * explode, no shuffle, no state: the 100 TB (and streaming) scoring
    * path, the same train-once/score-anything split as
    * [[TextStats.lmScoreAgainst]]. Produces values IDENTICAL to
    * [[dsirWeights]] (integer adds are order-free; spec-pinned).
    *
    * `logRatios` must be COMPLETE (one row per bucket):
    * `dsirLogRatios(..., complete = true)`.
    */
  def dsirScoreAgainst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      logRatios: DataFrame,
      nBuckets: Int,
      n: Int = 2
  ): DataFrame = {
    val packed = logRatios
      .groupBy()
      .agg(sort_array(collect_list(struct(col("bucket"), col("lr_u"))))
        .as("__pairs"))
      .select(transform(col("__pairs"), p => p.getField("lr_u")).as("__lr"))
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val grams = when(size(col("__lt")) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("__lt")) - (n - 1)),
        i => concat_ws(" ", slice(col("__lt"), i, lit(n)))))
    df.withColumn("__lt", toks)
      .withColumn("__g", grams)
      .crossJoin(broadcast(packed))
      .withColumn("n_grams", size(col("__g")).cast("long"))
      .withColumn("weight_u",
        aggregate(col("__g"), lit(0L), (acc, g) =>
          acc + element_at(col("__lr"),
            (graft.ops.Dedup.portableHash64(g) % nBuckets + 1).cast("int"))))
      .drop("__lt", "__g", "__lr")
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 — public
    * method): estimate hashed-n-gram feature distributions on a target
    * domain and on the raw pool, and score every raw document by the sum
    * of per-occurrence log-likelihood ratios. High weight ⇒ the document
    * looks like the target domain; resample the pool ∝ weight (or take a
    * top quantile) to reshape 100 TB of raw crawl toward a curated
    * distribution.
    *
    * Output: (id, n_grams, weight_u) — weight in integer micro-nats,
    * exact for cross-engine audit; docs shorter than n tokens carry
    * weight 0. Scale: the corpus pass explodes to (id, bucket) pairs and
    * partial-aggregates per doc before the one slim shuffle; the ratio
    * table joins by broadcast. Nothing document-sized rides a shuffle.
    */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 4096,
      n: Int = 2
  ): DataFrame = {
    val ratios = dsirLogRatios(raw, target, textCol, idCol, nBuckets, n)
    val weights = ngramBucketOccurrences(raw, idCol, textCol, nBuckets, n)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lr_u")).as("weight_u"))
    raw.select(col(idCol)).join(weights, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("weight_u"), lit(0L)).as("weight_u"))
  }

  /** Deterministic Gumbel(0,1) noise in integer micro-nats, derived from
    * the md5 of (seed, key): U = (h48 + 0.5) / 2^48 is an EXACT double
    * (48-bit integer over a power of two), G = −ln(−ln U). RNG-free, so
    * retried tasks, re-runs, and engines agree — sampling noise under the
    * same determinism contract as [[shardAssign]].
    */
  def gumbelMicroNat(key: Column, seed: String = "dsir"): Column = {
    val h = conv(substring(
      md5(concat_ws("|", lit(seed), key.cast("string"))), 1, 12), 16, 10)
      .cast("long")
    val u = (h.cast("double") + 0.5) / 281474976710656.0 // 2^48, exact
    round(-log(-log(u)) * 1e6, 0).cast("long")
  }

  /** DSIR importance RESAMPLING via the Gumbel-top-k trick: sampling k docs
    * without replacement ∝ exp(weight/T) is exactly taking the top k of
    * weight/T + Gumbel(0,1). All in integer micro-nats; weight is per-gram
    * normalized so document length doesn't masquerade as domain affinity;
    * gram-less docs sink below every real key. Deterministic end to end.
    *
    * Scale: [[dsirWeights]]'s shape plus one TakeOrderedAndProject —
    * executors keep k rows each, the driver merges k. For corpus-sized
    * selections swap the limit for [[topQuantileFilter]] on `key_u`.
    */
  def dsirResample(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      temperature: Double = 1.0,
      nBuckets: Int = 4096,
      n: Int = 2,
      seed: String = "dsir",
      precomputedWeights: Option[DataFrame] = None
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(temperature > 0, "temperature must be positive")
    // the production pattern (and the signature-memo lesson): weights are
    // the expensive sketch — materialize once, fan out to every draw
    val w = precomputedWeights.getOrElse(
      dsirWeights(raw, target, idCol, textCol, nBuckets, n))
    val avgW = when(col("n_grams") > 0,
      round(col("weight_u").cast("double") /
        (col("n_grams") * temperature), 0).cast("long"))
      .otherwise(lit(Long.MinValue / 4))
    w.withColumn("gumbel_u", gumbelMicroNat(col(idCol), seed))
      .withColumn("key_u", avgW + col("gumbel_u"))
      .orderBy(col("key_u").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_grams"), col("weight_u"), col("key_u"))
  }

  // ===== quality filtering =================================================

  /** Keep rows whose score reaches the q-th quantile of the score
    * distribution (top-(1-q) quality filtering).
    *
    * This exact form computes a true interpolated percentile — a single
    * reduce holding the score column, the ORACLE-CHECKABLE baseline. The
    * 100 TB path is `approxThreshold = true` (t-digest sketch, constant
    * memory, mergeable); both produce one scalar broadcast into a per-row
    * filter, so the corpus scan itself never shuffles.
    */
  def topQuantileFilter(
      df: DataFrame,
      scoreCol: String,
      q: Double,
      approxThreshold: Boolean = false
  ): DataFrame = {
    val thrAgg =
      if (approxThreshold) approx_percentile(col(scoreCol), lit(q), lit(10000))
      else percentile(col(scoreCol), lit(q))
    val thr = df.agg(thrAgg.as("__thr"))
    df.join(broadcast(thr)).filter(col(scoreCol) >= col("__thr")).drop("__thr")
  }

  /** Curriculum binning: every row's quantile bucket in [0, k) —
    * [[topQuantileFilter]]'s machinery generalized to k−1 exact
    * interpolated cut points. ONE aggregate produces the threshold array,
    * it rides along as a broadcast row, and assignment is a per-row
    * comparison against k−1 scalars: the corpus scan never shuffles.
    * `approxThreshold = true` swaps in the t-digest sketch (constant
    * memory, mergeable) for the 100 TB path, same as the filter.
    */
  def quantileBuckets(
      df: DataFrame,
      scoreCol: String,
      k: Int,
      approxThreshold: Boolean = false,
      outCol: String = "bucket"
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val probs = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val thrAgg =
      if (approxThreshold) approx_percentile(col(scoreCol), probs, lit(10000))
      else percentile(col(scoreCol), probs)
    val thr = df.agg(thrAgg.as("__thr"))
    df.join(broadcast(thr))
      .withColumn(outCol,
        size(filter(col("__thr"), t => col(scoreCol) >= t)).cast("long"))
      .drop("__thr")
  }

  // ===== sequence packing ==================================================

  /** Concat-and-chunk sequence packing: documents are laid out end-to-end in
    * (bucket, id) order and cut into fixed `budget`-token training windows;
    * a doc straddling a cut overflows into the next pack (standard LM
    * pretraining packing — no padding, no bin-packing search). Returns per
    * doc: its token count, the pack its first token lands in, and the
    * offset inside that pack.
    *
    * Scale shape: packing runs independently per `bucketCol` shard (the way
    * production packing is sharded), so the running sum is a window over
    * each bucket — parallel across buckets, never a single global task.
    * All arithmetic is exact integers.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCountCol: String,
      bucketCol: String,
      budget: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(bucketCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // `div` is integer division on longs (`/` would round-trip through
    // double and lose exactness past 2^53 cumulative tokens)
    df.withColumn("__cum_excl", coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("pack_in_bucket", expr(s"__cum_excl div ${budget}"))
      .withColumn("pack_offset", col("__cum_excl") % budget)
      .drop("__cum_excl")
  }

  /** Overlapping token-window chunking (context-window sequence prep):
    * chunks of `chunkSize` tokens starting every `stride` tokens —
    * start positions 1, 1+stride, 1+2·stride, … ≤ n_tokens, each chunk
    * sliced to at most `chunkSize`. stride ≤ chunkSize guarantees full
    * coverage; trailing chunks may be shorter; empty/whitespace docs emit
    * no chunks. chunk_idx = (start−1)/stride is derivable from the start
    * alone, so no window function is needed anywhere.
    *
    * Scale: a pure per-row projection + explode — fan-out n/stride chunks
    * per document, zero shuffle; the chunker runs inside the scan stage.
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int
  ): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(stride > 0 && stride <= chunkSize, "0 < stride <= chunkSize")
    // guarded: Spark's sequence(1, 0, step) throws on sign mismatch rather
    // than returning empty (same trap shinglesFromTokens documents)
    val starts = when(size(col("__toks")) >= 1,
      sequence(lit(1), size(col("__toks")), lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("start_tok", explode(starts))
      .withColumn("__chunk", slice(col("__toks"), col("start_tok"), lit(chunkSize)))
      .select(
        col(idCol),
        expr(s"CAST((start_tok - 1) div $stride AS BIGINT)").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("__chunk"), " ")).as("chunk_md5"))
  }

  /** C4-style blocklist filter signal: how many DISTINCT blocklisted words
    * a document contains (0 = keep). Exact lowercased token membership —
    * one `array_intersect` against a literal array, a pure per-row
    * projection inside the scan (the blocklist is a small constant; a
    * 100 TB corpus pass shuffles nothing).
    */
  def blocklistHits(text: Column, words: Seq[String]): Column =
    size(array_intersect(
      graft.ops.Dedup.tokens(text),
      array(words.map(w => lit(w.toLowerCase(java.util.Locale.ROOT))): _*)))
      .cast("long")

  // ===== benchmark contamination ===========================================

  /** Token n-gram strings from a (materialized) token-array column; empty
    * array when the document has fewer than n tokens (guarded explicitly:
    * Spark's sequence(1, 0) would generate a DESCENDING [1, 0], not empty).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** Per-document duplicate-n-gram statistics (the RefinedWeb/Gopher
    * cross-document repetition signal): for each doc, how many of its
    * DISTINCT token n-grams also occur in at least one other document, as
    * an exact parts-per-million ratio.
    *
    * Scale shape: n-grams are hashed to the portable 60-bit md5 family
    * IN THE MAP STAGE, so the document-frequency groupBy and the join back
    * shuffle only (doc_id, long) pairs — never n-gram strings. Both
    * aggregations combine map-side. 60-bit collisions are ~n²/2^61 —
    * vanishing at any corpus size that fits a cluster, and the oracle
    * replays the identical hash so the check is exact.
    *
    * The eager localCheckpoint below materializes the exploded (doc_id,
    * hash) stream — O(corpus n-grams) × 16 bytes — to executor-local
    * storage and drops lineage fault tolerance for it; that is the price
    * of running the tokenize+md5 map (the operator's dominant cost) once
    * instead of twice. A deployment whose local disks cannot hold ~16
    * bytes/n-gram should drop the cut and pay the second map pass.
    */
  def dupNgramStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    // native kernel: tokenize (lowercased, Dedup.tokens semantics — what
    // the oracle replays) + distinct n-grams in ONE pass per row, replacing
    // the interpreted per-element HOF shingle build; spread first (§2.5)
    // so the one-task small-input scan doesn't serialize the kernel
    val sh = Spread.byKey(df, col(idCol))
      .select(col(idCol),
        explode(graft.functions.minhash.token_ngrams(col(textCol), n)).as("__s"))
      .select(col(idCol), graft.ops.Dedup.portableHash64(col("__s")).as("__h"))
      // checkpointed (round 13, guide §1.2): the hashed gram stream feeds
      // both the doc-frequency agg and the join back — uncut, the
      // tokenize + md5-per-gram pass (the operator's dominant cost) ran
      // twice
      .localCheckpoint()
    val docFreq = sh.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    sh.join(docFreq, "__h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_ngrams"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup"))
      // integral ppm: div truncates toward zero == floor on non-negatives,
      // so the value is engine-exact (a double ratio would not be)
      .withColumn("dup_ppm", expr("(n_dup * 1000000) div n_ngrams"))
  }

  /** Documents sharing at least one token n-gram with the benchmark set —
    * the standard decontamination check before training. Returns
    * (idCol, n_contaminated_grams) for contaminated train docs only.
    *
    * Scale shape: the benchmark side is distinct n-grams of a (small)
    * eval corpus -> broadcast; the train side explodes n-grams in the map
    * stage and semi-joins without a wide shuffle. The final per-doc count
    * aggregates map-side. At 100 TB the train scan is the only big input,
    * touched once.
    */
  def contamination(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 4
  ): DataFrame = {
    // native one-pass n-gram kernel (case-preserving, per-doc distinct):
    // the HOF form re-sliced + re-joined strings per position interpreted;
    // per-doc dedup also shrinks the explode before the join
    def grams(df: DataFrame) = df
      .select(col(idCol),
        explode(graft.functions.minhash.token_ngrams(col(textCol), n,
          collapseShort = false, lowercase = false)).as("gram"))
    val benchGrams = grams(bench).select("gram").distinct()
    // spread the train side only (§2.5): it carries the n-gram kernel over
    // the whole corpus; the bench side dedups to a broadcast anyway
    grams(Spread.byKey(train, col(idCol)))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol))
      // plain count == count_distinct here: the kernel emits per-doc
      // DISTINCT grams, and it keeps the operator streaming-capable
      // (distinct aggregation is unsupported on streams)
      .agg(count(lit(1)).as("n_contaminated_grams"))
  }

  /** N-gram novelty of a candidate batch against the standing corpus: per
    * batch doc, how many of its distinct n-grams the corpus has never
    * seen — the "is this crawl increment worth ingesting" signal (the
    * additive complement of [[contamination]]; same [[dupNgramStats]]
    * hashing discipline: grams collapse to 60-bit longs in the map stage,
    * the corpus side dedups to one long per gram, and the join shuffles
    * only (id, long) pairs — never text).
    */
  def ngramNovelty(
      standing: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol),
        explode(graft.functions.minhash.token_ngrams(col(textCol), n)).as("__s"))
      .select(col(idCol), graft.ops.Dedup.portableHash64(col("__s")).as("__h"))
    // both sides pay the tokenize + md5 kernel; spread each (§2.5)
    val seen = grams(Spread.byKey(standing, col(idCol))).select("__h").distinct()
      .withColumn("__seen", lit(1))
    grams(Spread.byKey(batch, col(idCol)))
      .join(seen, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_ngrams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("(n_novel * 1000000) div n_ngrams"))
  }

  /** URL canonicalization — the first stage of crawl dedup (two fetches
    * of the same page under cosmetically different URLs must collapse
    * BEFORE any content hashing). Normalization policy, each step a
    * documented choice:
    *
    *   1. drop the fragment (`#…` — client-side only);
    *   2. normalize percent-encoding ([[graft.functions.text.percent_normalize]],
    *      RFC 3986 §6.2.2: decode UNRESERVED octets — `%7E` ≡ `~`, a real
    *      crawl-dedup miss class — and uppercase surviving escape hex;
    *      reserved octets like `%2F` stay encoded, their decode would
    *      change path structure);
    *   3. lowercase the scheme and host (case-insensitive per RFC 3986),
    *      NEVER the path or query (case-significant);
    *   4. drop default ports (`:80` on http, `:443` on https);
    *   5. drop a leading `www.` host label;
    *   6. drop tracking query params (`utm_*`, `gclid`, `fbclid`, `ref`)
    *      and empty params;
    *   7. sort the surviving params byte-lexicographically (param order
    *      is almost never semantic; sorting makes `?a=1&b=2` ≡
    *      `?b=2&a=1`);
    *   8. strip trailing slashes from the path (empty path → `/`).
    *
    * Inputs with no extractable `scheme://authority` (relative URLs,
    * `mailto:`, garbage) pass through UNCHANGED: collapsing them to a
    * shared key would merge every unparseable URL into one giant
    * canonical group and overstate duplicates in the crawl audit.
    *
    * Pure column algebra (regexp decompose + array HOFs over the handful
    * of params, plus the one compiled percent kernel) — codegen'd per
    * row, no shuffle; the query pins the chain against a closed-form
    * independent oracle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = graft.functions.text.percent_normalize(
      regexp_replace(url, "#.*$", ""))
    val base0 = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    val base = regexp_replace(
      regexp_replace(
        regexp_replace(base0, "^(http://[^:/]+):80$", "$1"),
        "^(https://[^:/]+):443$", "$1"),
      "^(https?://)www\\.", "$1")
    val path0 = regexp_extract(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(path0, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"), p =>
        p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)="))), "&")
    when(base0 === "", url).otherwise(
      concat(base, path,
        when(params === "", lit("")).otherwise(concat(lit("?"), params))))
  }

  /** Canonical-URL duplicate groups: each row keeps its canonical key and
    * the size of its canonical group — the fetch-dedup audit. One hash
    * exchange on the canonical key; nothing but (id, key) shuffles.
    */
  def urlDedupGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .withColumn("n_same",
        count(lit(1)).over(Window.partitionBy(col("canonical_url"))))

  /** HTML → text extraction (the boilerplate-strip stage every crawled
    * corpus runs before any text statistic). Deterministic tag algebra,
    * no parser dependency:
    *
    *   1. remove comments and the content-free containers wholesale
    *      (`<script>`, `<style>`, `<nav>` — markup whose TEXT must not
    *      leak into the corpus);
    *   2. strip every remaining tag to a single space (block boundaries
    *      must not glue words together); a tag is `<` through the first
    *      `>` OUTSIDE single/double quotes, so quoted attribute values
    *      containing `>` (`<div data-x="a>b">`) strip cleanly instead of
    *      leaving `b">` residue;
    *   3. decode the five predefined entities + `&#39;`/`&nbsp;` in ONE
    *      left-to-right pass each, `&amp;` LAST and never re-scanned —
    *      `A&amp;amp;B` decodes to `A&amp;B`, not `A&B`;
    *   4. collapse whitespace runs and trim.
    *
    * Each step is one `regexp_replace` — codegen'd, zero shuffle, and the
    * same chain replays in any RE2-compatible engine ((?s) + non-greedy +
    * quote-aware alternation only, no backreferences). A real-world
    * pipeline swaps step 2's uniform strip for a block-density
    * boilerplate model; the column contract (html in, text out, ratio
    * audit) is what the rest of the engine consumes. The query pins the
    * chain against a closed-form independent oracle.
    */
  def htmlToText(html: Column): Column = {
    // `>` inside quoted attribute values must not terminate the tag
    val tagBody = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
    val noBlocks = regexp_replace(html,
      s"(?s)<!--.*?-->|<script$tagBody>.*?</script>|<style$tagBody>.*?</style>" +
        s"|<nav$tagBody>.*?</nav>", " ")
    val noTags = regexp_replace(noBlocks, s"<$tagBody>", " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&nbsp;", " "),
      "&amp;", "&") // LAST: '&amp;lt;' must decode to '&lt;' literally
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
