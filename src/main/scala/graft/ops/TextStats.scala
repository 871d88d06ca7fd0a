package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Everything is per-row column algebra — computed inside the scan stage,
  * zero shuffle, no UDFs.
  */
object TextStats {

  // Per-row signals are single regexp_count SCANS, never split-into-array +
  // HOF (lambdas evaluate interpreted per ELEMENT) and never
  // regexp_replace-to-measure (which BUILDS a new string per row just to
  // take its length). Counting matches is the same single pass with zero
  // allocation — measured ~2x on the quality/langid queries at sf0.1.

  /** Whitespace token count: number of \S+ runs. */
  def tokenCount(text: Column): Column =
    regexp_count(trim(text), lit("\\S+"))

  /** BPE-ish subword count approximating tokenizer granularity without a
    * vocabulary: letter runs + digit runs + each single other non-space
    * char (equivalent to the lookaround word-piece split, spec-pinned).
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("""\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"""))

  def charCount(text: Column): Column = length(text)

  /** Ratio of punctuation chars to all chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      regexp_count(text, lit("""[\p{Punct}]""")).cast("double") / length(text))

  /** Ratio of digit chars to all chars. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      regexp_count(text, lit("[0-9]")).cast("double") / length(text))

  /** Mean word length (quality signal: garbage text skews extreme).
    * Sum of token lengths == non-whitespace char count — one scan, no
    * token array.
    */
  def meanWordLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(
      (length(text) - regexp_count(text, lit("\\s"))).cast("double") / n)
  }

  /** Small multilingual stopword table (public common-word lists). */
  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "at", "by", "this")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "oder", "von",
    "zu", "in", "ist", "es", "dass", "fur", "auf", "mit", "als", "bei", "ein")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "et", "ou", "de", "du",
    "dans", "est", "il", "que", "pour", "sur", "avec", "comme", "chez", "un")
  val StopwordsEs: Seq[String] = Seq("el", "la", "los", "las", "y", "o", "de",
    "en", "es", "que", "para", "sobre", "con", "como", "por", "un", "una")

  /** Whitespace-token stopword count via the native one-pass kernel
    * ([[graft.functions.StopwordCounts]]): tokenize once, hash-lookup per
    * token — O(tokens) instead of the regex alternation's O(bytes x words)
    * scan, and exactly the DuckDB oracle's `list_filter(ltoks,
    * list_contains(words))` formulation. The regex form below survives as
    * the executable spec the kernel is pinned against.
    */
  private def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    element_at(graft.functions.text.stopword_counts(text, Seq(stopwords)), 1)

  /** Regex formulation of [[stopwordCount]] (one codegen'd regexp_count
    * pass, `(^|\s)(w1|w2|…)(?=\s|$)`) — kept as the executable spec: both
    * forms must agree on every fixture, including consecutive stopwords
    * and punctuation-attached tokens.
    */
  private[graft] def stopwordCountRegex(text: Column, stopwords: Seq[String]): Column =
    regexp_count(lower(trim(text)),
      lit("(^|\\s)(" + stopwords.mkString("|") + ")(?=\\s|$)"))

  /** Fraction of tokens that are (english) stopwords — the classic
    * natural-language-vs-garbage quality signal.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = StopwordsEn): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(
      stopwordCount(text, stopwords).cast("double") / n)
  }

  /** Composite quality score in [0,1]: blends length, word shape,
    * punctuation and stopword signals (deterministic closed formula).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(charCount(text).cast("double") / 500.0, lit(1.0))
    val wordLen = meanWordLength(text)
    val wordScore = when(wordLen.between(3.0, 10.0), 1.0).otherwise(0.3)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * 0.3 + wordScore * 0.3 + punctScore * 0.2 + stopScore * 0.2, 6)
  }

  /** Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", table A1
    * — public method). Every threshold is evaluated as an INTEGER
    * cross-multiplication (`n_sym * 10 <= n_words` instead of a float
    * ratio compare), so the verdicts are bit-free of float semantics and
    * replay in any engine. One codegen'd projection — counts come from
    * regexp_count passes and one token array, no explode, no shuffle.
    *
    * Rules (each exposed, plus the conjunction `gopher_pass`):
    *   - word count in [minWords, maxWords]
    *   - mean word length in [3, 10] chars
    *   - symbol-to-word ratio ("#" or "...") <= 0.1
    *   - lines starting with a bullet <= 90%
    *   - lines ending with an ellipsis <= 30%
    *   - words with >= 1 alphabetic char >= 80%
    *   - >= 2 distinct hits from a small required-stopword set
    */
  /** Gopher's required-stopword list (table A1). */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherRules(
      df0: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      requiredWords: Seq[String] = GopherRequiredWords
  ): DataFrame = {
    // the rule columns are regex-heavy per-row work; under the small-input
    // gate the scan is one task, so spread before computing them (§2.5)
    val df = graft.ops.Spread.byKey(df0, col(idCol))
    val t = col(textCol)
    val nWords = tokenCount(t)
    val sumWordChars = length(t) - regexp_count(t, lit("\\s"))
    val nSym = regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))
    val nLines = size(split(t, "\n"))
    // RE2-safe patterns only (the PII lesson): no lookarounds, strict `$`
    val nBullet = regexp_count(t, lit("(?m)^\\s*[-*•]"))
    val nEllipsis = regexp_count(t, lit("(?m)\\.\\.\\.$"))
    val toks = filter(split(lower(trim(t)), "\\s+"), w => length(w) > 0)
    val nAlphaWords = size(filter(toks, w => regexp_count(w, lit("\\p{L}")) > 0))
    val nRequired = size(array_intersect(
      array_distinct(toks), array(requiredWords.map(lit): _*)))
    df.select(
      col(idCol),
      nWords.cast("long").as("n_words"),
      (nWords >= minWords && nWords <= maxWords).as("ok_word_count"),
      // 3 <= mean word length <= 10, as integer cross-multiplication
      (nWords > 0 && sumWordChars >= nWords * 3 &&
        sumWordChars <= nWords * 10).as("ok_mean_word_len"),
      (nSym * 10 <= nWords).as("ok_symbol_ratio"),
      (nBullet * 10 <= nLines * 9).as("ok_bullets"),
      (nEllipsis * 10 <= nLines * 3).as("ok_ellipsis"),
      (nAlphaWords * 10 >= nWords * 8).as("ok_alpha_words"),
      (nRequired >= 2).as("ok_stopwords"))
      .withColumn("gopher_pass",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_bullets") && col("ok_ellipsis") &&
          col("ok_alpha_words") && col("ok_stopwords"))
  }

  /** N-gram-heuristic language ID: score each language by stopword-hit
    * ratio plus a CJK character check; highest score wins (deterministic
    * tie-break by language code).
    */
  def languageId(text: Column): Column = {
    val nToks = tokenCount(text)
    // ONE tokenize pass scores all four languages (array of counts);
    // codegen subexpression elimination shares the counts subtree across
    // the four element_at uses
    val counts = graft.functions.text.stopword_counts(
      text, Seq(StopwordsEn, StopwordsDe, StopwordsFr, StopwordsEs))
    def score(i: Int): Column =
      when(nToks === 0, 0.0)
        .otherwise(element_at(counts, i).cast("double") / nToks)
    // count CJK chars directly — regexp_replace-to-length would BUILD a
    // stripped copy of every document just to measure it
    val cjk = regexp_count(text, lit("[一-鿿]"))
    val cjkRatio = when(length(text) === 0, 0.0).otherwise(cjk.cast("double") / length(text))
    val scored = map(
      lit("en"), score(1), lit("de"), score(2),
      lit("fr"), score(3), lit("es"), score(4),
      lit("zh"), cjkRatio)
    // argmax over the map, deterministic tie-break on language code
    val entries = map_entries(scored)
    val best = aggregate(
      entries,
      struct(lit("unknown").as("key"), lit(0.0).as("value")),
      (acc, e) =>
        when(e.getField("value") > acc.getField("value"), e).otherwise(acc))
    best.getField("key")
  }

  /** Winnowing-style document fingerprint: char k-gram rolling hashes,
    * minimum per sliding window, distinct set -> stable content sketch
    * (public algorithm: Schleimer, Wilkerson, Aiken, SIGMOD'03).
    *
    * Runs as ONE native codegen'd kernel per row
    * ([[graft.functions.WinnowFingerprint]]); only the whitespace normalize
    * stays declarative. Bit-identical to [[fingerprintHof]] (pinned by
    * TextStatsSpec), which survives as the executable specification.
    */
  def fingerprint(df: org.apache.spark.sql.DataFrame, textCol: String,
      out: String, k: Int = 8, window: Int = 4): org.apache.spark.sql.DataFrame =
    df.withColumn(out, graft.functions.text.winnow_fingerprint(
      regexp_replace(lower(col(textCol)), "\\s+", " "), k, window))

  /** [[fingerprint]] with the portable md5-low-60-bits k-gram family
    * instead of xxhash64 — every fingerprint value is then replayable in
    * ANSI SQL (`('0x' || substr(md5(g), 1, 15))::BIGINT`), which is what
    * lets the doc_fingerprint query be hash-checked against DuckDB.
    * Use [[fingerprint]] for throughput; this for cross-engine parity.
    */
  def fingerprintPortable(df: org.apache.spark.sql.DataFrame, textCol: String,
      out: String, k: Int = 8, window: Int = 4): org.apache.spark.sql.DataFrame =
    df.withColumn(out, graft.functions.text.winnow_fingerprint_portable(
      regexp_replace(lower(col(textCol)), "\\s+", " "), k, window))

  /** The declarative (higher-order-function) formulation of [[fingerprint]]:
    * semantically identical, but lambdas evaluate interpreted per k-gram —
    * kept as the reference implementation the native kernel is tested
    * against. `hash` swaps the k-gram hash (xxhash64 default; the portable
    * md5 family for [[fingerprintPortable]]'s equivalence spec).
    */
  private[graft] def fingerprintHof(df: org.apache.spark.sql.DataFrame, textCol: String,
      out: String, k: Int = 8, window: Int = 4,
      hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column = xxhash64(_))
      : org.apache.spark.sql.DataFrame = {
    // each stage materializes its array: higher-order lambdas re-evaluate
    // captured subtrees PER ELEMENT, so the normalized text / kgram array
    // must be real columns or the regex normalize re-runs O(n) times per row
    val others = df.columns.map(col).toSeq
    val s1 = df.withColumn("__norm", regexp_replace(lower(col(textCol)), "\\s+", " "))
    val s2 = s1.withColumn("__kg",
      when(length(col("__norm")) < k, array(hash(col("__norm"))))
        .otherwise(transform(sequence(lit(1), length(col("__norm")) - k + 1),
          i => hash(col("__norm").substr(i, lit(k))))))
    // sliding-window min via `window` SHIFTED copies zipped with least():
    // O(window) array ops per DOCUMENT, vs a slice+array_min per POSITION
    // (which allocates a sub-array per element — measured ~4x slower)
    val winLen = size(col("__kg")) - (window - 1)
    val shiftedMin = (0 until window)
      .map(k => slice(col("__kg"), lit(k + 1), winLen))
      .reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    val s3 = s2.withColumn(out, array_distinct(
      when(size(col("__kg")) <= window, array(array_min(col("__kg"))))
        .otherwise(shiftedMin)))
    s3.select(others :+ col(out): _*)
  }

  /** Single 64-bit digest of the fingerprint set (joinable/groupable). */
  def fingerprintDigest(df: org.apache.spark.sql.DataFrame, textCol: String,
      out: String, k: Int = 8, window: Int = 4): org.apache.spark.sql.DataFrame =
    fingerprint(df, textCol, "__fp", k, window)
      .withColumn(out, xxhash64(array_sort(col("__fp"))))
      .withColumn("__n_grams", size(col("__fp")))
      .drop("__fp")

  /** Corpus TF-IDF: per-(doc, term) weight `tf * ln(N / df_t)` over
    * whitespace tokens. Returns (idCol, term, tf_cnt, df_t, tfidf) — rank
    * downstream for top-terms-per-doc or feature vectors.
    *
    * Scale shape: both aggregates combine map-side and shuffle on term /
    * (doc, term) — no broadcast of anything corpus-sized; N is one scalar.
    * Ranking exactness: `tfidf_u` (tf_cnt x micro-scaled idf) is an exact
    * integer, so downstream ORDER BY tfidf_u is reproducible cross-engine
    * where float ordering would tie-break on last-ulp noise.
    */
  def tfIdf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    // one shared tokenizer (graft.ops.Dedup.tokens) — a third inline copy
    // is exactly the drift the kernel equivalence specs exist to prevent
    val terms = df.select(
      col(idCol), explode(graft.ops.Dedup.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf_cnt"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    // N rides along as a broadcast scalar: no eager job at construction
    // time, the plan stays lazy end to end
    val nDf = df.agg(count_distinct(col(idCol)).cast("double").as("__n"))
    tf.join(dfT, Seq("term"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(nDf))
      .withColumn("idf_u", round(log(col("__n") / col("df_t")) * 1e6, 0).cast("long"))
      .withColumn("tfidf_u", col("tf_cnt") * col("idf_u"))
      .withColumn("tfidf", round(col("tfidf_u").cast("double") / 1e6, 6))
      .drop("__n")
  }

  /** BM25 retrieval scoring of every document against a fixed query term
    * set (Okapi BM25, Lucene's always-positive idf, k1 = 1.2, b = 0.75).
    * Returns one row per matching doc: (idCol, matched_terms, score_u,
    * bm25).
    *
    * Exactness: with k1 = 12/10 and b = 3/4 the per-term weight
    * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` multiplies through to a
    * ratio of integers (T = total corpus tokens, N = docs, dl = doc
    * length):  `22·tf·T / (10·tf·T + 3·T + 9·dl·N)`. The idf snaps to
    * integer micro-nats ([[tfIdf]]'s trick: `round(ln((N+1)/(df+0.5))·1e6)`
    * — every input to the ln is derived from exact counts the same way on
    * any engine), so each per-term score is one integer division and the
    * document score is an exact int64 sum — cross-engine-reproducible
    * ranking with no float fold-order dependence. Headroom:
    * idf_u·22·tf·T < 2^63 ⇒ tf·T < 6·10^13 — per-shard scoring (shard-local
    * T) long before any real corpus approaches it.
    *
    * Scale shape: tf shuffles on (doc, term) with map-side combine over
    * query-matching tokens only; df_t and the (N, T) totals are
    * query-bounded / scalar broadcasts. Nothing corpus-sized crosses a
    * broadcast.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String]
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val withToks = df
      .select(col(idCol), graft.ops.Dedup.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    val tf = withToks
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf_cnt"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val tot = withToks.agg(
      count(lit(1)).as("__nd"), sum(col("__dl")).as("__tt"))
    tf.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("idf_u",
        round(log((col("__nd") + lit(1)).cast("double") /
          (col("df_t") + lit(0.5))) * 1e6, 0).cast("long"))
      .withColumn("__sc_u", expr(
        "(idf_u * 22 * tf_cnt * __tt) DIV " +
          "(10 * tf_cnt * __tt + 3 * __tt + 9 * __dl * __nd)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_terms"), sum("__sc_u").as("score_u"))
      .withColumn("bm25", round(col("score_u").cast("double") / 1e6, 6))
  }

  // ===== token entropy =====================================================

  /** Per-document Shannon entropy of the token distribution (nats):
    *
    *   H = ln(n) - (1/n) * sum_w c_w ln(c_w)
    *
    * Low entropy flags templated/repetitive text (the information-theoretic
    * twin of [[graft.ops.Corpus.repetitionStats]]'s distinct-ratio signal).
    *
    * The logs are snapped to integer micro-nats ([[tfIdf]]'s trick), so the
    * whole numerator `n*ln(n)_u - sum(c*ln(c)_u)` is exact integer
    * arithmetic and the single final division is engine-identical.
    *
    * Scale shape: token-level groupBy combines map-side to (doc, word)
    * counts; the per-doc rollup shuffles doc-sized rows only.
    */
  def tokenEntropy(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String
  ): org.apache.spark.sql.DataFrame = {
    val tf = df
      .select(col(idCol), explode(graft.ops.Dedup.tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    tf.groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("__n"),
        sum(col("__c") *
          round(log(col("__c").cast("double")) * 1e6, 0).cast("long")).as("__clnc_u"))
      .select(col(idCol),
        col("__n").as("n_tokens"),
        ((col("__n") * round(log(col("__n").cast("double")) * 1e6, 0).cast("long") -
          col("__clnc_u")).cast("double") /
          (col("__n") * lit(1000000L)).cast("double")).as("entropy"))
  }

  // ===== Zipf fit ==========================================================

  /** Least-squares slope of ln(freq) against ln(rank) over the top-`topK`
    * corpus words — the Zipf exponent (natural text ≈ −1; generated /
    * templated corpora drift off). Both logs snap to integer KILO-nats
    * (1e3, not 1e6: the OLS cross-terms `n·Σxy` must stay inside int64),
    * so numerator and denominator of
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * are exact integers and the single division is engine-identical.
    * Quantization costs ~1e-4 relative on the slope — irrelevant for a
    * corpus-drift statistic, and it buys exact cross-engine audit.
    *
    * Scale shape: word counts combine map-side; everything after is
    * vocab-sized (the rank window runs over ≤ topK rows).
    */
  def zipfSlope(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      topK: Int = 200,
      minCount: Long = 2L
  ): org.apache.spark.sql.DataFrame = {
    val counts = df
      .select(explode(graft.ops.Dedup.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
    // distributed top-k FIRST (TakeOrderedAndProject — no single-partition
    // sort of the whole vocabulary), then rank the K survivors; the total
    // order (count desc, word) is deterministic so top-k == rank <= k
    val ranked = counts
      .orderBy(col("__c").desc, col("__w"))
      .limit(topK)
      .withColumn("__rank",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("__c").desc, col("__w"))))
      .select(
        round(log(col("__rank").cast("double")) * 1e3, 0).cast("long").as("__x"),
        round(log(col("__c").cast("double")) * 1e3, 0).cast("long").as("__y"))
    ranked.agg(
        count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(
        col("__n").as("n_words"),
        ((col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
          .as("zipf_slope"))
  }

  // ===== collocations ======================================================

  /** PMI-scored bigram collocations over the corpus:
    *
    *   pmi(x, y) = ln( P(x,y) / (P(x) P(y)) )
    *             = ln( (c_xy * N * N) / (M * c_x * c_y) )
    *
    * with c_xy the bigram count, c_x/c_y unigram counts, N total unigrams,
    * M total bigrams. High-PMI pairs co-occur far above chance — the
    * standard collocation/phrase-mining signal for corpus analysis.
    *
    * Scale design: bigrams are formed INSIDE the row (slice+zip of the
    * token array — no window, no self-join), then two map-side-combining
    * groupBys produce vocab-sized frames; the final joins are between
    * vocab-sized aggregates, never the corpus. The log is snapped to
    * integer micro-units (same trick as [[tfIdf]]) so results are
    * engine-exact.
    */
  def pmiBigrams(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Long = 2L
  ): org.apache.spark.sql.DataFrame = {
    val toks = graft.ops.Dedup.tokens(col(textCol))
    // materialize the token array once per row: both slice() operands (and
    // size()) would otherwise re-run the tokenizer subtree per use
    val pairs = zip_with(
      slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
      slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = df
      .select(toks.as("__t"))
      .select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val uni = df
      .select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val totals = uni.agg(sum(col("c_w")).as("__n"))
    // M (total bigrams) = sum over docs of max(0, n_tokens - 1)
    val mDf = df.select(greatest(size(toks) - 1, lit(0)).cast("long").as("__b"))
      .agg(sum(col("__b")).as("__m"))
    bg.join(uni.select(col("w").as("w1"), col("c_w").as("c_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_y")), Seq("w2"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        totals.select(col("__n"))))
      .crossJoin(org.apache.spark.sql.functions.broadcast(mDf))
      .withColumn("pmi_u",
        round(log((col("c_xy") * col("__n") * col("__n")).cast("double") /
          (col("__m") * col("c_x") * col("c_y")).cast("double")) * 1e6, 0)
          .cast("long"))
      .withColumn("pmi", round(col("pmi_u").cast("double") / 1e6, 6))
      .select("w1", "w2", "c_xy", "pmi")
  }

  /** CCNet-style statistical language-model scoring: train an add-one-
    * smoothed bigram LM on the corpus itself, then score every document by
    * its total and mean negative log-likelihood —
    *
    *   p(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + V)
    *
    * with c(w1·) the bigram-prefix count and V the unigram vocabulary.
    * Low-perplexity docs read like the corpus; high-NLL docs are the
    * gibberish/boilerplate tail a quality filter drops. Output per doc:
    * `n_bigrams`, `nll_u` (total NLL in integer log-micro-units) and
    * `avg_nll_u` (the perplexity proxy). Docs with < 2 tokens carry no
    * bigram evidence and are excluded.
    *
    * Float parity: each ln() is of an exact integer and snapped to micro-
    * units separately ([[tfIdf]]'s trick), so every per-bigram contribution
    * is an exact BIGINT in any engine; NLL is negated before the integer
    * divide so truncating `div` and flooring `//` agree.
    *
    * Scale design: bigrams form INSIDE the row (slice+zip, no self-join);
    * the per-doc bigram frame is pre-aggregated with multiplicity BEFORE
    * joining the model (so the model joins touch distinct (doc, bigram)
    * pairs, not every occurrence); counts/vocab are map-side-combining
    * aggregates; V rides along as one broadcast row.
    */
  /** One row per bigram OCCURRENCE (keyCols*, w1, w2). Bigrams form INSIDE
    * the row (slice+zip of the materialized token array — no window, no
    * self-join).
    */
  private def bigramRows(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      keyCols: String*
  ): org.apache.spark.sql.DataFrame = {
    val toks = df.select(keyCols.map(col) :+
      graft.ops.Dedup.tokens(col(textCol)).as("__t"): _*)
    val pairs = zip_with(
      slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
      slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    toks.select(keyCols.map(col) :+ explode(pairs).as("p"): _*)
      .select(keyCols.map(col) :+ col("p.w1").as("w1") :+ col("p.w2").as("w2"): _*)
  }

  /** Per-document bigram occurrences with multiplicity: (idCol, w1, w2,
    * __k) — the pre-aggregation that keeps model joins touching distinct
    * (doc, bigram) pairs instead of every occurrence.
    */
  private def docBigrams(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String
  ): org.apache.spark.sql.DataFrame =
    bigramRows(df, textCol, idCol)
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__k"))

  /** Train the bigram model once: (w1, w2, c_xy, c_x) with c_xy the bigram
    * count and c_x its prefix total. Materialize this table and score any
    * number of batches/streams against it ([[lmScoreAgainst]]).
    */
  def lmModel(
      df: org.apache.spark.sql.DataFrame,
      textCol: String
  ): org.apache.spark.sql.DataFrame = {
    // NOT checkpointed (round 14): a round-13 localCheckpoint here measured
    // 0.15-0.25 s SLOWER on both lm consumers in an interleaved same-box
    // A/B (doc_lm_score min 1.24 s plain vs 1.48 s cut) — the bigram agg's
    // exchange is reused across the prefix-total agg and the join back, so
    // the cut only added a materialization barrier. Same verdict as the
    // lmScore composition note below.
    val bg = bigramRows(df, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val pre = bg.groupBy("w1").agg(sum(col("c_xy")).as("c_x"))
    bg.join(pre, Seq("w1"))
  }

  /** Unigram vocabulary size of the training corpus, as a 1-row frame
    * (rides along every scoring query as a broadcast).
    */
  def lmVocabSize(
      df: org.apache.spark.sql.DataFrame,
      textCol: String
  ): org.apache.spark.sql.DataFrame =
    df.select(explode(graft.ops.Dedup.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("__v"))

  /** Score documents against a trained model. Add-one smoothing makes
    * unseen n-grams well-defined with zero-coalesced counts — and the
    * bigram and prefix lookups are SEPARATE left joins, because an unseen
    * bigram whose prefix WAS seen still divides by that prefix's count
    * (p = 1/(c_x+V)), the standard backoff-free smoothing — so NEW corpora
    * and streams (stream-static joins) score without retraining.
    */
  def lmScoreAgainst(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      model: org.apache.spark.sql.DataFrame,
      vocab: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    // batch: pre-aggregate multiplicity so the model join touches distinct
    // (doc, bigram) pairs. Streaming: that would chain TWO stateful
    // aggregations (a global-watermark correctness trap) — join occurrence
    // rows directly and let the one per-doc aggregation do all the state.
    val bg =
      if (docs.isStreaming)
        bigramRows(docs, textCol, idCol).withColumn("__k", lit(1L))
      else docBigrams(docs, idCol, textCol)
    // c_x is constant per w1 in the model table; max() just collapses it
    val prefixCounts = model.groupBy("w1").agg(max(col("c_x")).as("c_x"))
    bg.join(model.select("w1", "w2", "c_xy"), Seq("w1", "w2"), "left")
      .join(prefixCounts, Seq("w1"), "left")
      .crossJoin(org.apache.spark.sql.functions.broadcast(vocab))
      .withColumn("__lp_u",
        round(log((coalesce(col("c_xy"), lit(0L)) + 1).cast("double")) * 1e6, 0)
          .cast("long") -
          round(log((coalesce(col("c_x"), lit(0L)) + col("__v")).cast("double")) * 1e6, 0)
            .cast("long"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__k")).as("n_bigrams"),
        (-sum(col("__k") * col("__lp_u"))).as("nll_u"))
      .withColumn("avg_nll_u", expr("nll_u div n_bigrams"))
  }

  def lmScore(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String
  ): org.apache.spark.sql.DataFrame =
    // deliberately the plain composition (round 13, guide §1.2 examined):
    // a single-tokenize restructure (token arrays checkpointed once,
    // model read as its factor tables) measured 0.1-0.25 s SLOWER in an
    // interleaved A/B — the materialization barrier costs more than the
    // repeated tokenize passes it saves; lmModel's internal bg checkpoint
    // already stops the model subtree replaying
    lmScoreAgainst(df, idCol, textCol, lmModel(df, textCol), lmVocabSize(df, textCol))

  /** Inverted-index posting lists: per term, collection frequency,
    * document frequency, and the first `postingsCap` doc ids (sorted,
    * comma-joined). The retrieval-index build over the corpus.
    *
    * Scale guard: the naive `collect_set(doc_id) per word` holds a
    * stopword's ENTIRE posting set in one aggregation buffer — at corpus
    * scale that's every doc id in memory. Here the cap is enforced
    * BEFORE collection (row_number over the deduped (word, doc_id)
    * pairs), so no buffer ever exceeds `postingsCap` entries; cf/df stay
    * full-precision map-side-combinable aggregates on a separate pass of
    * the same shuffled pairs.
    */
  def invertedPostings(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      postingsCap: Int = 5
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(postingsCap >= 1, s"postingsCap must be >= 1, got $postingsCap")
    val toks = df.select(col(idCol).as("__d"),
      explode(Dedup.tokens(col(textCol))).as("word"))
    val stats = toks
      .groupBy("word")
      .agg(count(lit(1)).as("cf"), countDistinct(col("__d")).as("df"))
    val capped = toks
      .select("word", "__d")
      .distinct()
      .withColumn("__rn",
        row_number().over(Window.partitionBy("word").orderBy("__d")))
      .filter(col("__rn") <= postingsCap)
      .groupBy("word")
      .agg(
        array_join(
          transform(array_sort(collect_list(col("__d"))), _.cast("string")),
          ",").as("postings"))
    stats.join(capped, Seq("word"))
  }

  /** TextRank keyword extraction: PageRank over the word-adjacency graph
    * (distinct undirected bigram edges), the classic graph-centrality
    * keyword ranker. Composes [[graft.ops.Graph.pageRank]]'s integer
    * micro-unit rounds with the corpus plane: words enter the graph as
    * their portable 60-bit md5 ids ([[Dedup.portableHash64]], the
    * cross-engine contract), so every rank value and the final ordering
    * replay exactly in SQL.
    *
    * Scale shape: the edge table is the DISTINCT bigram set — vocab²-
    * bounded, usually vocab-sized; each PageRank round is the two-exchange
    * Pregel shape; the word join at the end touches the vocab, never the
    * corpus. Top-k by (rank, word) is a TakeOrderedAndProject.
    */
  def textrank(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      iters: Int = 3,
      topK: Int = 20
  ): org.apache.spark.sql.DataFrame = {
    // distinct bigram set checkpointed (round 13, guide §1.2): vocab²-
    // bounded, and it now also SOURCES the word↔nid decode table — every
    // ranked node is by construction the hash of some bigram endpoint, so
    // deriving vocab from bg's endpoints instead of a second tokenize pass
    // over the corpus leaves the inner decode join's output untouched
    // while dropping a full corpus scan
    val bg = bigramRows(df, textCol).select("w1", "w2").distinct()
      .localCheckpoint()
    val e = bg.select(
      graft.ops.Dedup.portableHash64(col("w1")).as("src"),
      graft.ops.Dedup.portableHash64(col("w2")).as("dst"))
    val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val vocab = bg.select(col("w1").as("w"))
      .unionAll(bg.select(col("w2").as("w")))
      .distinct()
      .withColumn("nid", graft.ops.Dedup.portableHash64(col("w")))
    Graph.pageRank(und, "src", "dst", iters)
      .join(vocab, col("node") === col("nid"))
      .select(col("w").as("word"), col("pr_micro"))
      .orderBy(desc("pr_micro"), col("word"))
      .limit(topK)
  }

  /** RAKE (Rapid Automatic Keyword Extraction): candidate phrases are the
    * maximal stopword-free token runs; each content word scores
    * `deg(w)/freq(w)` (deg = Σ phrase length over the word's phrase
    * occurrences — co-occurrence-favoring; freq = occurrence count) and a
    * phrase scores the sum of its members' scores. Multi-word technical
    * phrases out-rank frequent single words — the classic
    * no-model keyword extractor.
    *
    * Exactness: scores are integer micro-units — `score_u(w) = deg·1e6
    * div freq` (both non-negative, so div ≡ //) and phrase score is an
    * exact int64 sum of member units, so the ranking replays bit-for-bit.
    *
    * Scale shape: segmentation is a running stopword count per doc — one
    * doc-keyed window exchange; phrase assembly and both stat tables are
    * map-side-combined groupBys (phrase- and vocab-sized); the stopword
    * set rides as a literal array. Top-k is a TakeOrderedAndProject.
    */
  def rakeKeywords(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String] = StopwordsEn,
      topK: Int = 20
  ): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val stops = array(stopwords.map(lit): _*)
    // deliberately NOT spread (round 14, §2.5 examined): the doc-keyed
    // window right below repartitions by __d anyway, and the extra
    // exchange measured 0.90x in an interleaved A/B
    val toks = df.select(col(idCol).as("__d"),
        posexplode(graft.ops.Dedup.tokens(col(textCol))).as(Seq("__p", "w")))
      .withColumn("__stop", array_contains(stops, col("w")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__d")).orderBy(col("__p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // deliberately UNCUT (round 13, guide §1.2 examined): seg and phrases
    // both fan out, but a 4-variant interleaved A/B (no cut / seg / phrases
    // / both) put every checkpoint variant 0.2-0.4 s BEHIND the recompute —
    // the window's exchange is reused across consumers, the duplicate
    // in-task folds are cheap, and the materialization barrier is not
    val seg = toks
      .withColumn("__seg", sum(when(col("__stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("__stop"))
    val phrases = seg
      .groupBy(col("__d"), col("__seg"))
      .agg(
        array_join(transform(array_sort(collect_list(
          struct(col("__p"), col("w")))), _.getField("w")), " ").as("phrase"),
        count(lit(1)).as("__len"))
    val occ = seg
      .join(phrases, Seq("__d", "__seg"))
      .select(col("w"), col("__len"))
    val wordScores = occ
      .groupBy(col("w"))
      .agg(sum(col("__len")).as("__deg"), count(lit(1)).as("__freq"))
      .withColumn("__score_u", expr("__deg * 1000000 div __freq"))
    seg
      .join(phrases, Seq("__d", "__seg"))
      .join(wordScores, Seq("w"))
      .groupBy(col("__d"), col("__seg"), col("phrase"))
      .agg(sum(col("__score_u")).as("__pscore"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("__pscore")).as("score_u"))
      .orderBy(desc("score_u"), col("phrase"))
      .limit(topK)
  }

  /** Dunning log-likelihood (G²) collocation ranking — the
    * significance-aware alternative to PMI (which over-rewards rare
    * pairs): for each bigram, the 2×2 contingency over all M bigram
    * slots —
    *
    *   O11 = c(w1,w2),  O12 = R − O11,  O21 = C − O11,  O22 = M − R − C + O11
    *   (R = Σ_y c(w1,y) row total, C = Σ_x c(x,w2) column total)
    *   G² = 2·Σ_{O>0} O · ln(O·M / (row·col))
    *
    * Every ln() argument is decomposed into exact-integer lns snapped to
    * micro-nats (`lnU(O)+lnU(M)−lnU(row)−lnU(col)`, the [[tfIdf]] trick),
    * so each cell contribution is an exact int64 product and `g2_u` (G² in
    * 2×micro-nat units) is engine-exact — the ranking can't be reordered
    * by float fold-order. Row/column totals are computed BEFORE the
    * minCount filter (the filter gates candidates, never the margins).
    *
    * Output: top-`topK` by (g2_u desc, w1, w2): `(w1, w2, c_xy, g2_u)`.
    *
    * Scale shape: bigrams form in-row; margins are vocab-sized map-side
    * combined aggregates; M rides as one broadcast row; the final top-k is
    * a TakeOrderedAndProject, never a global sort.
    */
  def collocationsG2(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 20
  ): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // checkpointed (round 13, guide §1.2): vocab²-bounded, four consumers
    // (margins, M, and the candidate stream) — uncut, each replays the
    // full corpus bigram pass
    val bg = bigramRows(df, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .localCheckpoint()
    val rowTot = bg.groupBy("w1").agg(sum(col("c_xy")).as("r_tot"))
    val colTot = bg.groupBy("w2").agg(sum(col("c_xy")).as("c_tot"))
    val mTot = bg.agg(sum(col("c_xy")).as("m"))
    def lnU(c: Column): Column =
      round(log(c.cast("double")) * 1e6, 0).cast("long")
    def term(o: Column, rr: Column, cc: Column): Column =
      when(o > 0,
        o * (lnU(o) + lnU(col("m")) - lnU(rr) - lnU(cc))).otherwise(lit(0L))
    bg.filter(col("c_xy") >= minCount)
      .join(rowTot, Seq("w1"))
      .join(colTot, Seq("w2"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(mTot))
      .withColumn("g2_u",
        lit(2L) * (
          term(col("c_xy"), col("r_tot"), col("c_tot")) +
          term(col("r_tot") - col("c_xy"), col("r_tot"),
            col("m") - col("c_tot")) +
          term(col("c_tot") - col("c_xy"), col("m") - col("r_tot"),
            col("c_tot")) +
          term(col("m") - col("r_tot") - col("c_tot") + col("c_xy"),
            col("m") - col("r_tot"), col("m") - col("c_tot"))))
      .select("w1", "w2", "c_xy", "g2_u")
      .orderBy(desc("g2_u"), col("w1"), col("w2"))
      .limit(topK)
  }
}
