package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-corpus (training-data) pipelines.
  *
  * All variants are shuffle-frugal by construction:
  *   - exact dedup: one hash groupBy (map-side partial agg);
  *   - MinHash/LSH: signatures are per-row column algebra (no shuffle),
  *     candidate generation shuffles only (band_id, band_hash, doc_id)
  *     triples — never text — and buckets are size-capped so a degenerate
  *     bucket (all-identical boilerplate at 100 TB) cannot go quadratic;
  *   - SimHash: per-row 64-bit fingerprint + banded matching on it.
  */
object Dedup {

  // ---------- tokenization / shingling ----------

  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles from a MATERIALIZED token-array column.
    *
    * The tokens argument must be a real column, not the `tokens(text)`
    * expression inline: the lambda captures its argument subtree and
    * re-evaluates it PER ELEMENT, so an inline regex tokenization would run
    * O(positions) times per document (measured 7x slowdown at sf0.1).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        array_distinct(
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** Word n-gram shingles of a text column. Convenience form; hot paths
    * should project `tokens(text)` into a column and call
    * `shinglesFromTokens` (see note there).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  // ---------- exact ----------

  /** Exact dedup on normalized text: keep the smallest id per content hash.
    * sha2-256 over whitespace-normalized lowercase text; collision risk at
    * 100 TB corpus sizes is ~2^-128 — acceptable.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.groupBy(sha2(norm, 256).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("group_size")
      )
  }

  /** Incremental exact dedup — the production shape: drop INCOMING rows
    * whose normalized content already exists in the KNOWN corpus, and
    * in-batch duplicates (keep the smallest incoming id per content).
    *
    * Scale shape: the known side reduces to DISTINCT content hashes
    * (never text — at 100 TB you materialize that hash table once and
    * reuse it every batch); the join keys are 256-bit hashes, so the
    * incoming scan shuffles only (hash, id). A daily increment is tiny
    * next to the corpus: broadcast the INCREMENT's hashes and stream the
    * known hash table map-side if the increment fits, or let AQE pick the
    * side — both plans shuffle no text.
    */
  def incrementalExact(
      incoming: DataFrame,
      known: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    def hashed(df: DataFrame) = {
      val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
      df.select(col(idCol), sha2(norm, 256).as("__ch"))
    }
    val knownHashes = hashed(known).select("__ch").distinct()
    hashed(incoming)
      .join(knownHashes, Seq("__ch"), "left_anti")
      .groupBy(col("__ch"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__ch")
  }

  /** Incremental NEAR-dup dedup: drop incoming docs whose MinHash bands
    * collide with the standing corpus at est-jaccard >= threshold. The
    * near twin of [[incrementalExact]] — at 100 TB the known side's
    * banded signature table is materialized once (bucketed by band hash)
    * and each increment probes it; only signatures move, never text.
    * Returns surviving incoming (idCol) rows.
    */
  def incrementalNearDup(
      incoming: DataFrame,
      known: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.8
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    def banded(df: DataFrame) = {
      val sig = signatures(df, idCol, textCol, shingleSize, numHashes)
      sig.select(
        col("doc_id"), col("sig"),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => aggregate(
              slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              b.cast("long"),
              (acc, x) => (acc * 31L + x) % MinhashP)))
          .as(Seq("band_id", "band_hash")))
    }
    val inc = banded(incoming).select(col("band_id"), col("band_hash"),
      col("doc_id").as("inc_id"), col("sig").as("inc_sig"))
    val kn = banded(known).select(col("band_id"), col("band_hash"),
      col("sig").as("kn_sig"))
    val dupIds = inc.join(kn, Seq("band_id", "band_hash"))
      .filter(
        (aggregate(
          zip_with(col("inc_sig"), col("kn_sig"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v
        ).cast("double") / numHashes) >= minEstJaccard)
      .select(col("inc_id")).distinct()
    incoming.select(col(idCol))
      .join(dupIds, col(idCol) === col("inc_id"), "left_anti")
  }

  // ---------- MinHash + LSH ----------

  /** Mersenne prime 2^31 - 1: affine arithmetic over residues stays under
    * 62 bits, so no ANSI long-multiply overflow and no wrapping semantics —
    * the family is reproducible in ANY engine with exact 64-bit integers.
    */
  val MinhashP = 2147483647L

  /** Deterministic affine coefficients (a_i, b_i) for the permutation
    * family h_i = (a_i * h + b_i) mod P — delegated to the native kernel's
    * canonical definition (ONE source of truth for kernel, declarative
    * form, and oracle; see graft.functions.MinhashImpl.coefficients for
    * why the draws must be INDEPENDENT, not multiples of one pair). The
    * DuckDB oracle interpolates the SAME values as literals, keeping every
    * signature value cross-engine checkable.
    */
  def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    val (as, bs) = graft.functions.MinhashImpl.coefficients(numHashes)
    as.toIndexedSeq.zip(bs.toIndexedSeq)
  }

  /** Portable 60-bit base hash: low 15 hex digits of md5, mod P. Identical
    * in DuckDB as ('0x' || substr(md5(s), 1, 15))::BIGINT % P — md5 is the
    * cross-engine contract (xxhash64 exists only in Spark). Cost vs
    * xxhash64 is one string hash per shingle — noise next to the explode —
    * and the numHashes derived values become 3-op affines instead of
    * hash calls.
    */
  def portableHash(c: Column): Column = portableHash64(c) % MinhashP

  /** The raw 60-bit md5 value (no mod): SimHash needs uniform BITS, and a
    * mod-P residue would zero the top 29 of them.
    */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash signature from a MATERIALIZED shingle-array column: numHashes
    * longs; position i is min over shingles of (a_i * md5h + b_i) mod P —
    * the string is hashed ONCE per shingle. Reference (HOF) form of
    * [[signatures]]; both produce identical values.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    array(minhashCoeffs(numHashes).map { case (a, b) =>
      array_min(transform(shinglesCol, s => (portableHash(s) * a + b) % MinhashP))
    }: _*)

  /** (doc_id, sig) frame via the native one-pass kernel
    * ([[graft.functions.MinhashSignature]]): the signature computes WHERE
    * THE TEXT IS READ — no explode, no aggregate, ZERO shuffle. At 100 TB
    * the sketch stage is pure scan work. Values are bit-identical to
    * [[signaturesAgg]] (equivalence-spec pinned) and to the DuckDB oracle.
    */
  def signatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int
  ): DataFrame =
    // null text drops (the agg form's explode drops it; a (doc_id, null)
    // row would diverge from the executable spec and the oracle).
    // Deliberately NOT spread (round 14, §2.5 examined): the signature
    // frame is the persisted session memo feeding ~8 minhash consumers,
    // several of them ITERATIVE (the nearDupClusters closure) — a
    // 32-partition cached frame multiplied every downstream stage's task
    // count and measured doc_dedup_groups 0.63x / cluster_sizes 0.71x /
    // curate 0.77x in an interleaved A/B; the one-task kernel cost is
    // paid once per session, the partition tax on every round.
    df.filter(col(textCol).isNotNull)
      .select(
        col(idCol).as("doc_id"),
        graft.functions.minhash.minhash_signature(col(textCol), shingleSize, numHashes)
          .as("sig"))

  /** The declarative (explode + groupBy) formulation of [[signatures]]:
    * shingling runs ONCE per doc, each shingle is md5-hashed ONCE, the
    * family derives numHashes values by affine maps mod P
    * ([[minhashCoeffs]]), and the per-doc mins complete in the MAP-SIDE
    * partial aggregate — the shuffle carries only (doc_id, numHashes
    * longs). Kept as the executable specification the native kernel is
    * tested against.
    */
  private[graft] def signaturesAgg(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int
  ): DataFrame = {
    val exploded = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        explode(shinglesFromTokens(col("__toks"), shingleSize)).as("__s"))
      .select(col("doc_id"), portableHash(col("__s")).as("__h"))
    val mins = minhashCoeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((col("__h") * a + b) % MinhashP).as(s"__h$i")
    }
    exploded
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"__h$i")): _*).as("sig"))
  }

  /** Candidate near-duplicate pairs via banded LSH over MinHash signatures.
    *
    * numHashes = bands * rowsPerBand. Two docs land in the same bucket iff
    * one full band of their signatures matches; P(candidate) ≈
    * 1-(1-j^r)^b. The self-join shuffles only signature buckets;
    * `maxBucketSize` drops degenerate buckets (boilerplate clusters) before
    * they go quadratic — at 100 TB this guard is what keeps the stage alive.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 1000,
      precomputedSigs: Option[DataFrame] = None
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = precomputedSigs.getOrElse(
      signatures(df, idCol, textCol, shingleSize, numHashes))
    // width guard fails fast on a mis-sized precomputed signature (a short
    // sig would silently collapse every band hash to its seed, putting the
    // whole corpus in one bucket); own select — referencing the checked
    // alias from a sibling expression would be a lateral column alias
    val checked = sig.select(
      col("doc_id"),
      when(size(col("sig")) === numHashes, col("sig"))
        .otherwise(raise_error(concat(
          lit(s"minhash signature width != $numHashes: "),
          size(col("sig")).cast("string")))).as("sig"))
    // band hash = band-id-seeded Horner fold of the band's rows mod P —
    // cross-engine reproducible (acc stays < P so acc*31 + h < 2^36)
    val banded = checked.select(
      col("doc_id"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => aggregate(
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            b.cast("long"),
            (acc, x) => (acc * 31L + x) % MinhashP)))
        .as(Seq("band_id", "band_hash"))
    )
    // size the buckets on a SLIM (band_id, band_hash) projection — a window
    // over the banded rows would shuffle every 32-long signature a second
    // time — and broadcast the (rare, by construction degenerate) oversized
    // buckets back as an anti-join, so the banded rows shuffle exactly once:
    // for the self-join below
    val oversized = banded
      .groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBucketSize)
      .select(col("band_id"), col("band_hash"))
    val capped = banded.join(broadcast(oversized), Seq("band_id", "band_hash"), "left_anti")

    val a = capped.select(col("band_id"), col("band_hash"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band_id"), col("band_hash"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // estimated jaccard = matching signature positions / numHashes
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v
        ).cast("double") / numHashes).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact-substring near-duplicate pairs — the suffix-style dedup signal
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better") re-expressed as anchor k-grams: for every document pair
    * sharing at least one exact k-token span, report how many positional
    * k-gram anchors match and the LONGEST shared token span.
    *
    * Method: each token position emits its k-gram's portable 60-bit hash
    * (hashed in the map stage — the shuffle carries (id, pos, long), never
    * text). Anchors equi-join on hash, bucket-capped like LSH (a k-gram in
    * more than `maxBucketSize` positions is boilerplate, not duplication).
    * Matched position pairs on one diagonal (pa − pb constant) with
    * consecutive pa form a run of length L — an exact shared span of
    * L + k − 1 tokens; per-diagonal island detection is window algebra over
    * pair-anchor sets (tiny: only matching anchors survive to this stage).
    */
  def sharedSpanPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minSpan: Int = 12,
      maxBucketSize: Int = 200
  ): DataFrame = {
    require(minSpan >= k, s"minSpan ($minSpan) must be >= k ($k)")
    val runs = spanIslands(df, idCol, textCol, k, maxBucketSize)
    // every matched anchor belongs to exactly one diagonal island, so
    // n_anchors = sum of run lengths — ONE pass over runs, and the
    // expensive self-join is never evaluated twice
    runs.groupBy("id_a", "id_b")
      .agg(sum(col("__run")).as("n_anchors"), max(col("__run")).as("__maxrun"))
      .withColumn("longest_span", (col("__maxrun") + (k - 1)).cast("long"))
      .filter(col("longest_span") >= minSpan)
      .select(col("id_a"), col("id_b"), col("n_anchors"), col("longest_span"))
  }

  /** The anchor-match diagonal islands shared by [[sharedSpanPairs]] and
    * [[scrubSharedSpans]]: one row per maximal run of consecutive matched
    * anchors — (id_a, id_b, __run = anchors in the run, __b0 = first
    * matched position on the b side). A run of length L is an exact shared
    * span of L + k − 1 tokens starting at token __b0 of doc b.
    */
  private def spanIslands(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      maxBucketSize: Int
  ): DataFrame = {
    val grams = when(size(col("__t")) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("__t")) - (k - 1)),
        i => concat_ws(" ", slice(col("__t"), i, lit(k)))))
    // the tokenize+md5 explode is referenced by the cap pass AND both join
    // sides — truncate lineage once (the RangeSeries lesson) so the corpus
    // scan runs a single time; the checkpoint holds only slim
    // (id, pos, hash) rows
    // the one-task small-input scan cannot parallelize the tokenize +
    // md5-per-anchor map below — spread it first (§2.5, gate-guarded)
    val anchors = Spread.byKey(df, col(idCol))
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .select(col("__id"), posexplode(grams).as(Seq("__p0", "__s")))
      .select(col("__id"), (col("__p0") + 1).as("__pos"),
        portableHash64(col("__s")).as("__h"))
      .localCheckpoint(true)
    // cap on a slim projection, remove by broadcast anti-join (the LSH
    // lesson: the anchor rows shuffle exactly once, for the self-join)
    // checkpoint the (tiny) oversized set too: the self-join's attribute
    // dedup duplicates the anti-join subtree per side, and without the
    // checkpoint each side re-scans and re-aggregates the full anchor set
    // to rebuild it (observed in the physical plan: two cap aggs)
    val oversized = anchors.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select("__h")
      .localCheckpoint(true)
    val capped = anchors.join(broadcast(oversized), Seq("__h"), "left_anti")
    // one hash per position per side -> the join result is already
    // distinct on (id_a, id_b, pa, pb)
    // materialize __diag as an attribute BEFORE the window: partitioning the
    // window and grouping the islands by the SAME attribute lets the island
    // groupBy ride the window's exchange ((id_a,id_b,__diag) is a subset of
    // its grouping keys) — recomputing pa−pb in the groupBy planned a
    // second full shuffle of the matched anchors
    val pairs = capped
      .select(col("__h"), col("__id").as("id_a"), col("__pos").as("pa"))
      .join(capped.select(col("__h"), col("__id").as("id_b"), col("__pos").as("pb")),
        Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("__diag"))
    val w = Window
      .partitionBy(col("id_a"), col("id_b"), col("__diag"))
      .orderBy(col("pa"))
    pairs
      .withColumn("__grp", col("pa") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("__diag"), col("__grp"))
      .agg(count(lit(1)).as("__run"), min(col("pb")).as("__b0"))
  }

  /** Exact-substring SCRUB — the removal half of the Lee et al. dedup
    * story [[sharedSpanPairs]] detects: every shared span of at least
    * `minSpan` tokens is cut from the LATER document of its pair (id_b of
    * the id_a < id_b orientation — keep-first, the exact-dedup
    * convention), overlapping cuts merged per document. Returns every
    * document: (idCol, n_tokens, n_removed, scrubbed_text), where
    * scrubbed_text is the surviving tokens joined by single spaces — the
    * scrub operates in normalized token space (the dedup pipeline's
    * working representation), not raw bytes.
    *
    * Scale shape: islands are the (tiny) matched-anchor output; interval
    * merging is window algebra partitioned per document over a handful of
    * spans; the merged spans then fold back as ONE per-doc array via an
    * equi-join on doc id, and the cut itself is in-row array algebra
    * (zip positions, drop covered, rejoin) — tokens never explode, never
    * shuffle, and the corpus is scanned once. The HOF lambda cost is
    * per-token × per-span only on documents that actually have cuts.
    */
  def scrubSharedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minSpan: Int = 12,
      maxBucketSize: Int = 200
  ): DataFrame = {
    require(minSpan >= k, s"minSpan ($minSpan) must be >= k ($k)")
    val spans = spanIslands(df, idCol, textCol, k, maxBucketSize)
      .filter(col("__run") + (k - 1) >= minSpan)
      .select(col("id_b").as("__mid"), col("__b0").as("__s0"),
        (col("__b0") + col("__run") + (k - 2)).as("__s1"))
    // merge overlapping/adjacent cuts per document: classic max-end sweep
    val ord = Window.partitionBy(col("__mid")).orderBy(col("__s0"), col("__s1"))
    val merged = spans
      .withColumn("__mp",
        max(col("__s1")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__mp").isNull || col("__s0") > col("__mp"), 1).otherwise(0))
      .withColumn("__g",
        sum(col("__new")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__mid"), col("__g"))
      .agg(min(col("__s0")).as("__s0"), max(col("__s1")).as("__s1"))
    val spansPerDoc = merged.groupBy(col("__mid"))
      .agg(collect_list(struct(col("__s0"), col("__s1"))).as("__spans"))
    Spread.byKey(df, col(idCol))
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .join(spansPerDoc, col(idCol) === col("__mid"), "left")
      .withColumn("__kept",
        when(col("__spans").isNull, col("__t"))
          .otherwise(filter(
            zip_with(col("__t"), sequence(lit(1), size(col("__t"))),
              (tok, i) =>
                when(!exists(col("__spans"),
                  sp => i >= sp.getField("__s0") && i <= sp.getField("__s1")),
                  tok)),
            t => t.isNotNull)))
      .select(col(idCol), size(col("__t")).as("n_tokens"),
        (size(col("__t")) - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(col("__kept"), " ").as("scrubbed_text"))
  }

  /** Near-dup groups from candidate pairs: connected components by
    * LEVEL-WISE GRAPH CONTRACTION — per level, take min-over-neighbors
    * labels, collapse the label pointer chains to idempotence (pointer
    * doubling, exponential in chain depth), rewrite the edges through the
    * labels and recurse on the contracted graph; compose the per-level
    * maps at the end. Converges in O(log n) LEVELS on every graph family
    * (`maxIter` bounds levels, not hops). Flat min-label propagation —
    * the previous build — moves min-information one graph edge per round
    * regardless of pointer chasing, i.e. O(diameter) rounds: the 30×
    * DBSCAN ridge needed more than 48 of those and silently under-merged
    * (caught by ScaleSelfCheck split_core_edges at sf3, round 9).
    */
  def components(pairs: DataFrame, maxIter: Int = 16): DataFrame =
    componentsWithConvergence(pairs, maxIter)._1

  /** [[components]] plus an explicit trustworthiness flag. The flag means
    * "the returned labels ARE the true components": `false` can only come
    * from the distributed contraction path, where the maxIter level guard
    * fired while the contracted graph still had edges, so the labels may
    * merge fewer nodes than the true components — without the flag a
    * pathological graph would surface only as an undiagnosable oracle
    * mismatch downstream. The test is exact (edges remain ⟺ not
    * converged), not a fixed-point heuristic, and non-convergence is also
    * logged loudly. The driver union-find path is NOT iterative — its
    * labels are exact by construction — so it always returns `true`,
    * regardless of `maxIter` (to exercise the maxIter guard in a test,
    * force the distributed path with `driverMaxEdges=0`).
    *
    * Size dispatch (the broadcast-join-threshold philosophy): a candidate
    * graph at or under `driverMaxEdges` DOUBLED edge rows (default 2 M ≈
    * tens of MB of longs) collects to the driver and runs an exact
    * union-find — one job instead of rounds × (3 joins + checkpoint),
    * measured ~20× on the DBSCAN core graph — with labels IDENTICAL to
    * the converged propagation (both are "min node id per component";
    * pinned by a Round7PropertySpec generator property). Bigger graphs
    * keep the distributed contraction: a 100 TB near-dup graph never
    * fits a driver, a post-blocking candidate graph usually does.
    */
  def componentsWithConvergence(
      pairs: DataFrame,
      maxIter: Int = 16,
      driverMaxEdges: Long = 2000000L): (DataFrame, Boolean) = {
    // maxIter bounds contraction LEVELS; with 0 the level loop would never
    // run, `maps` would stay empty and maps.head would throw an opaque
    // NoSuchElementException on any graph big enough to skip the driver
    // path — make the misuse loud at the API boundary instead
    require(maxIter >= 1, s"components maxIter must be >= 1, got $maxIter")
    // the driver path's cast("long") would null-collapse a NON-NUMERIC id
    // column into one giant component silently; fail loudly instead (the
    // distributed path shares the guard: min() over string ids is
    // lexicographic, not the numeric min-label contract callers pin)
    Seq("id_a", "id_b").foreach { c =>
      pairs.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => ()
        case other => throw new IllegalArgumentException(
          "componentsWithConvergence needs integral id columns (min-label " +
            s"semantics), got $c: $other — hash string doc ids to int64 " +
            "first (e.g. Dedup.portableHash64)")
      }
    }
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst")
      .persist() // reused every round; also backs the early-exit probe
    // ONE count materializes the cache and serves both the empty early-
    // exit and the driver-path size dispatch (round 13: the previous
    // isEmpty-then-count shape was two sequential jobs on every call, and
    // components sits under ~10 dedup/density queries)
    val nEdges = edges.count()
    // early-exit: no candidate pairs -> no components; skips maxIter rounds
    // of shuffles on an empty graph (the common case for a clean corpus)
    if (nEdges == 0L) {
      edges.unpersist()
      return (pairs.sparkSession.emptyDataFrame
        .withColumn("id", lit(0L)).withColumn("label", lit(0L)).limit(0), true)
    }
    if (nEdges <= driverMaxEdges) {
      val rows = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .collect()
      val idx = scala.collection.mutable.LongMap.empty[Int]
      val ids = new scala.collection.mutable.ArrayBuffer[Long]()
      def nodeOf(id: Long): Int = idx.getOrElse(id, {
        val n = ids.length; idx.update(id, n); ids += id; n
      })
      val srcN = new Array[Int](rows.length)
      val dstN = new Array[Int](rows.length)
      var e = 0
      while (e < rows.length) {
        srcN(e) = nodeOf(rows(e).getLong(0))
        dstN(e) = nodeOf(rows(e).getLong(1))
        e += 1
      }
      val parent = Array.tabulate(ids.length)(identity)
      def find(x0: Int): Int = {
        var x = x0
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      e = 0
      while (e < rows.length) {
        val a = find(srcN(e)); val b = find(dstN(e))
        if (a != b) parent(a) = b
        e += 1
      }
      // label = MIN node id of the component (the propagation's fixpoint)
      val minOfRoot = scala.collection.mutable.LongMap.empty[Long]
      ids.indices.foreach { n =>
        val root = find(n).toLong
        if (ids(n) < minOfRoot.getOrElse(root, Long.MaxValue))
          minOfRoot.update(root, ids(n))
      }
      val out = ids.indices.map(n =>
        org.apache.spark.sql.Row(ids(n), minOfRoot(find(n).toLong)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val spark = pairs.sparkSession
      // the distributed path's labels inherit the input id dtype — match it
      val idType = edges.schema("src").dataType
      edges.unpersist()
      return (spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, 1), schema)
        .select(col("id").cast(idType).as("id"),
          col("label").cast(idType).as("label")), true)
    }
    // Distributed path: LEVEL-WISE GRAPH CONTRACTION. The flat min-label
    // propagation this replaces moved min-information ONE GRAPH EDGE per
    // round — O(diameter) rounds no matter how the label pointers are
    // chased, because min-semantics collapses pointers onto local minima,
    // which are fixed points of the pointer map until the true min reaches
    // them through the graph. The 30× DBSCAN ridge blew past maxIter=48 of
    // those rounds and silently under-merged 238,956 core-core edges
    // (caught by ScaleSelfCheck's split_core_edges invariant at sf3; a
    // stderr warning was the only other trace). Contraction is O(log n)
    // LEVELS on every graph family instead:
    //
    //   level k: (1) L(v) = min(v, min neighbor)        — one groupBy
    //            (2) collapse L's pointer chains        — L <- L∘L passes
    //                (the descending-id-chain pathology where contraction
    //                alone shrinks by one node per level; chains are
    //                exactly where pointer doubling IS exponential)
    //            (3) contract: rewrite edges through L, drop loops, dedup;
    //                recurse on the contracted graph
    //
    // Flat parts of the graph shrink ≥2× per level via (1)+(3); chain
    // parts collapse exponentially via (2). Labels compose back level by
    // level at the end. `converged` = the contracted edge set is EMPTY —
    // an exact test, not a fixed-point heuristic. Every level's frame is
    // EAGERLY flat-checkpointed (core/Lineage): the next level references
    // it multiple times, and without lineage truncation the plan tree
    // grows exponentially in levels (measured on the old loop: a converged
    // round cost 24 s on 523 pairs when only persist()ed).
    val spark = pairs.sparkSession
    // Local flatCheckpoint that ALSO returns the backing RDD: every pass
    // and level produces a new localCheckpointed generation, and a
    // checkpointed RDD's blocks live until explicitly unpersisted (its
    // lineage is truncated, so Spark can never recompute-and-evict them).
    // Round-9 advisor finding: up to ~40 passes × maxIter levels of stale
    // label generations accrued storage memory for the life of the job on
    // exactly the large-graph path this code exists for. Each generation
    // is now freed as soon as its successor is materialized; only the
    // returned labels frame keeps its blocks.
    def flatCk(df: DataFrame)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val r = df.rdd
      r.localCheckpoint()
      r.count()
      (spark.createDataFrame(r, df.schema), r)
    }
    var (cur, curRdd) = flatCk(edges)
    edges.unpersist()
    val maps = scala.collection.mutable.ArrayBuffer
      .empty[(DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])]
    var level = 0
    var empty = false // nonempty here: the isEmpty fast path returned above
    while (!empty && level < maxIter) {
      // (1) first-hop labels; doubled edges put every node in `src`
      var (lab, labRdd) = flatCk(
        cur.groupBy(col("src").as("id"))
          .agg(min(col("dst")).as("__nbr"))
          .select(col("id"), least(col("id"), col("__nbr")).as("label")))
      // (2) pointer collapse TO IDEMPOTENCE, fused convergence test: an
      // accumulator on the materialization pass instead of a second job;
      // task retries can only over-count — a spurious "changed" costs one
      // extra no-op pass, never a premature exit. The collapse must run to
      // idempotence, not a small fixed cap: each pass halves chain depth,
      // so idempotence costs ceil(log2 depth) map-only passes, while a
      // partially-collapsed chain contracts by only 2^cap nodes per LEVEL
      // (measured: a consecutive-id 5k chain under a 4-pass cap shrank 16
      // nodes/level and blew maxIter). 40 passes covers depth 2^40.
      var pass = 0
      var chainChanged = true
      while (chainChanged && pass < 40) {
        val stepped = lab.as("x")
          .join(lab.select(col("id").as("__pid"), col("label").as("__plabel")),
            col("x.label") === col("__pid"), "left")
          .select(col("x.id").as("id"),
            least(col("x.label"), coalesce(col("__plabel"), col("x.label")))
              .as("label"),
            col("x.label").as("__prev"))
        val acc = spark.sparkContext.longAccumulator
        val r = stepped.rdd.map { row =>
          if (row.getLong(1) != row.getLong(2)) acc.add(1L); row
        }
        r.localCheckpoint()
        r.count()
        chainChanged = acc.value > 0
        labRdd.unpersist(blocking = false) // superseded by r, never read again
        lab = spark.createDataFrame(r, stepped.schema).drop("__prev")
        labRdd = r
        pass += 1
      }
      maps += ((lab, labRdd))
      // (3) contract; both directions of a doubled edge relabel
      // symmetrically, so the contracted set stays doubled by construction
      val (nextCur, nextCurRdd) = flatCk(
        cur.join(lab.select(col("id").as("src"), col("label").as("__ls")),
            Seq("src"))
          .join(lab.select(col("id").as("dst"), col("label").as("__ld")),
            Seq("dst"))
          .select(col("__ls").as("src"), col("__ld").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct())
      curRdd.unpersist(blocking = false)
      cur = nextCur
      curRdd = nextCurRdd
      empty = cur.isEmpty
      level += 1
    }
    val converged = empty
    curRdd.unpersist(blocking = false) // final edge set (empty if converged)
    // compose downward: total(x) = L_k(...L_1(x)). A level-k label with no
    // row in L_{k+1} was already a singleton there — keep it (coalesce).
    // Each consumed map and superseded composition is freed immediately;
    // only the final labels frame keeps its checkpoint blocks (it is the
    // return value).
    var (labels, labelsRdd) = maps.head
    maps.tail.foreach { case (m, mRdd) =>
      val (nextLabels, nextLabelsRdd) = flatCk(
        labels.as("t")
          .join(m.select(col("id").as("__pid"), col("label").as("__plabel")),
            col("t.label") === col("__pid"), "left")
          .select(col("t.id").as("id"),
            coalesce(col("__plabel"), col("t.label")).as("label")))
      labelsRdd.unpersist(blocking = false)
      mRdd.unpersist(blocking = false)
      labels = nextLabels
      labelsRdd = nextLabelsRdd
    }
    if (!converged)
      System.err.println(
        s"[graft] components(): NOT converged after $level levels " +
          s"(maxIter=$maxIter); labels may under-merge — raise maxIter")
    (labels, converged)
  }

  /** Full near-dup clustering: every doc gets a cluster id (its component's
    * min doc id; singleton docs label themselves). The deliverable of a
    * dedup pass — keep one doc per cluster_id downstream.
    */
  def nearDupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.8,
      precomputedSigs: Option[DataFrame] = None
  ): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, shingleSize, bands, rowsPerBand,
        precomputedSigs = precomputedSigs)
      .filter(col("est_jaccard") >= minEstJaccard)
    val labels = components(pairs)
    df.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("label"), col("id")).as("cluster_id"))
  }

  // ---------- n-gram Jaccard verification ----------

  /** Exact token-n-gram Jaccard for given candidate pairs (the verify pass
    * after LSH): joins shingle SETS only for candidates, never all pairs.
    */
  def ngramJaccard(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    val sh = df
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__toks"))
      .select(col("__id"), shinglesFromTokens(col("__toks"), n).as("__sh"))
    pairs
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .drop("sh_a", "sh_b")
  }

  /** Asymmetric n-gram CONTAINMENT for candidate pairs — the
    * doc-inside-doc signal Jaccard dilutes (a snippet fully copied into a
    * 10× larger page has Jaccard ≈ 0.1 but containment 1.0). For each
    * (id_a, id_b) pair: |A ∩ B| / min(|A|, |B|) over distinct n-gram
    * sets, reported in exact integer ppm (`inter·10⁶ div min` — no float
    * division crosses engines).
    *
    * Scale shape: same as [[ngramJaccard]] — shingle arrays join onto the
    * (already-blocked) candidate pairs only; never all-pairs.
    */
  def ngramContainment(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    // checkpointed (round 13, guide §1.2): the shingle-set frame is
    // attached on BOTH endpoints of every pair — uncut, the tokenize +
    // shingle build ran once per side; spread (round 14, §2.5) so the
    // one-task small-input scan doesn't serialize that build
    val sh = Spread.byKey(df, col(idCol))
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__toks"))
      .select(col("__id"),
        array_distinct(shinglesFromTokens(col("__toks"), n)).as("__sh"))
      .localCheckpoint()
    pairs
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .withColumn("n_inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("n_small",
        least(size(col("sh_a")), size(col("sh_b"))).cast("long"))
      .withColumn("containment_ppm",
        expr("CASE WHEN n_small > 0 THEN n_inter * 1000000 DIV n_small END"))
      .drop("sh_a", "sh_b")
  }

  // ---------- exact threshold join (prefix filtering) ----------

  /** EXACT Jaccard-threshold self-join via prefix filtering — the
    * All-Pairs / PPJoin family (Bayardo et al. WWW'07; Vernica et al.
    * SIGMOD'10 for the distributed shape). Returns EVERY doc pair whose
    * distinct token-n-gram sets have Jaccard >= thetaPpm/1e6 — the exact
    * counterpart to [[minhashCandidatePairs]]: recall is 1.0 by
    * construction, yet the candidate space is nowhere near O(n²).
    *
    * Prefix principle: order grams by global (document-frequency, gram)
    * ascending — rarest first. Each set S joins on only its first
    * p = |S| − ⌈θ·|S|⌉ + 1 grams in that order. If J(A,B) ≥ θ then
    * i = |A∩B| ≥ ⌈θ·max(|A|,|B|)⌉, and the globally-SMALLEST common gram
    * has rank ≤ |S| − i + 1 ≤ p in both sets — so the equi-join on prefix
    * grams cannot miss a qualifying pair. Frequent grams (stopword
    * shingles — exactly the ones that would explode a naive gram join)
    * sort into suffixes and never generate candidates.
    *
    * Scale shape: grams are hashed to the portable 60-bit family in the
    * scan stage, so no shuffle ever carries text. Work = ONE gram-keyed
    * exchange on which a window attaches each occurrence's document
    * frequency (round 14, guide §2.4 — the previous groupBy(g) agg +
    * join-back paid a second exchange of the gram stream and sorted both
    * sides of the resulting SMJ; the window sorts the stream once, and is
    * value-identical because grams are per-doc distinct, so
    * count(*) over (partition by g) IS the document frequency), one
    * per-doc regroup to pick prefixes, one equi-join on prefix grams with
    * the integer size filter θ·max(|A|,|B|) ≤ min(|A|,|B|) pruning
    * cross-size candidates pre-dedup, and a verify join that touches only
    * surviving pairs' gram arrays. In the small-input regime
    * ([[Spread.isSmall]]) the gram build is spread across the session
    * shuffle width before the md5-per-gram map (the corpus arrives as ONE
    * unsplittable scan task there — §2.5) and the deduped candidate set
    * BROADCASTS into the two verify joins so the gram-set frame is never
    * exchanged; past the gate the natural scan parallelism and the
    * planner's shuffle join are the (unbounded-candidate) scale shape.
    * All comparisons are exact integer cross-multiplications in ppm — no
    * float crosses an engine boundary.
    */
  def setSimilarityJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      thetaPpm: Long = 800000L
  ): DataFrame = {
    require(thetaPpm > 0 && thetaPpm <= 1000000L,
      s"thetaPpm must be in (0, 1000000], got $thetaPpm")
    val M = 1000000L
    val small = Spread.isSmall(df)
    // (doc_id, distinct gram-hash set); checkpointed — feeds the prefix
    // pass AND the verify join (two consumers, one compute)
    val gramSets = Spread.byKey(df, col(idCol))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        array_distinct(
          transform(shinglesFromTokens(col("__toks"), n),
            g => portableHash64(g))).as("gs"))
      .localCheckpoint()
    // rarest-first order per doc, then keep the prefix: array_sort on
    // (df, g) structs is the global order; p = sz − ceil(θ·sz) + 1
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val prefixes = gramSets
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .withColumn("df", count(lit(1)).over(wDf))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("df"), col("g"))).as("dg"))
      .select(col("doc_id"),
        expr("transform(array_sort(dg), x -> x.g)").as("ordered"))
      .select(col("doc_id"),
        size(col("ordered")).cast("long").as("sz"),
        slice(col("ordered"), lit(1),
          (size(col("ordered")).cast("long") -
            expr(s"($thetaPpm * size(ordered) + ${M - 1}) div $M") + 1L)
            .cast("int")).as("prefix"))
    val pre = prefixes.select(col("doc_id"), col("sz"),
      explode(col("prefix")).as("g"))
    val cand = pre
      .select(col("g"), col("doc_id").as("id_a"), col("sz").as("sz_a"))
      .join(pre.select(col("g"), col("doc_id").as("id_b"), col("sz").as("sz_b")),
        Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .filter(lit(thetaPpm) * greatest(col("sz_a"), col("sz_b")) <=
        lit(M) * least(col("sz_a"), col("sz_b")))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    // small-input regime: candidates are bounded by the (small) corpus, so
    // hand the pair set to the verify joins as a broadcast — the gram-set
    // frame streams through both joins unexchanged. (A checkpoint+count
    // gate here measured 0.9 s SLOWER than the plain hint at sf0.1: the
    // materialization barrier and the extra count job cost more than they
    // inform. Past the gate candidates are unbounded: planner's choice.)
    val candSide = if (small) broadcast(cand) else cand
    candSide
      .join(gramSets.select(col("doc_id").as("id_a"), col("gs").as("gs_a")),
        Seq("id_a"))
      .join(gramSets.select(col("doc_id").as("id_b"), col("gs").as("gs_b")),
        Seq("id_b"))
      .withColumn("n_inter",
        size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
      .withColumn("n_union",
        size(col("gs_a")).cast("long") + size(col("gs_b")).cast("long") -
          col("n_inter"))
      .filter(col("n_inter") * M >= lit(thetaPpm) * col("n_union"))
      .withColumn("jaccard_ppm", expr(s"n_inter * $M div n_union"))
      .select("id_a", "id_b", "n_inter", "n_union", "jaccard_ppm")
  }

  /** Reference brute-force formulation of [[setSimilarityJoin]] — the
    * executable specification the prefix-filtered path is spec-tested
    * against (identical output required): every gram of every doc joins,
    * intersections come from the pair group-by. Quadratic in the hot-gram
    * count; never the production path.
    */
  private[graft] def setSimilarityJoinBrute(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      thetaPpm: Long
  ): DataFrame = {
    val M = 1000000L
    val gramSets = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        array_distinct(
          transform(shinglesFromTokens(col("__toks"), n),
            g => portableHash64(g))).as("gs"))
    val e = gramSets.select(col("doc_id"), explode(col("gs")).as("g"))
    val inter = e.select(col("g"), col("doc_id").as("id_a"))
      .join(e.select(col("g"), col("doc_id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    val sz = gramSets.select(col("doc_id"), size(col("gs")).cast("long").as("sz"))
    inter
      .join(sz.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_inter"))
      .filter(col("n_inter") * M >= lit(thetaPpm) * col("n_union"))
      .withColumn("jaccard_ppm", expr(s"n_inter * $M div n_union"))
      .select("id_a", "id_b", "n_inter", "n_union", "jaccard_ppm")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash fingerprint over a MATERIALIZED token-hash array column:
    * bit b is set iff the majority of token hashes have bit b set.
    */
  def simhash64FromHashes(hashesCol: Column): Column = {
    // bit b of fingerprint = 1 iff sum over tokens of (bit set ? 1 : -1) > 0
    val bits = transform(
      sequence(lit(0), lit(63)),
      b =>
        when(
          aggregate(hashesCol, lit(0L),
            (acc, h) => acc + when(call_function("shiftright", h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
            > 0, lit(1L)).otherwise(lit(0L))
    )
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)), (bit, i) => call_function("shiftleft", bit, i.cast("int"))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** (doc_id, fp) frame via the native one-pass kernel
    * ([[graft.functions.Simhash64]]): fingerprint computed where the text
    * is read — no explode, no aggregate, zero shuffle (same shape as
    * [[signatures]]). Bit-identical to [[withSimhashAgg]].
    */
  def withSimhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // one-pass native kernel; "has any non-whitespace char" is exactly
    // "has >= 1 token", replaying the agg form's tokenless-doc drop
    // (length(trim(..)) > 0 would miss tab/newline-only docs: SQL trim
    // strips only ASCII space)
    df.filter(col(textCol).isNotNull && col(textCol).rlike("\\S"))
      .select(col(idCol).as("doc_id"),
        graft.functions.minhash.simhash64(col(textCol)).as("fp"))

  /** The declarative (explode + lane-packed groupBy) formulation of
    * [[withSimhash]] — kept as the executable specification the native
    * kernel is tested against: the 60 per-bit popcounts are PACKED into
    * 16 aggregate longs (four 16-bit lanes each), so the hash aggregate
    * carries 17 columns instead of 64; lanes cannot overflow below 65k
    * tokens/doc. Post-agg: bit b = 1 iff popcount_b * 2 > n_tokens.
    */
  private[graft] def withSimhashAgg(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("__t"))
      // portable 60-bit hash: bits 60-63 are constant 0, so those
      // fingerprint bits vote to 0 identically in every engine
      .select(col("doc_id"), portableHash64(col("__t")).as("__h"))
    val packedSums = (0 until 16).map { i =>
      // lanes: bits i, i+16, i+32, i+48 at 16-bit offsets 0/16/32/48
      val contrib = (0 until 4).map { j =>
        shiftleft(shiftright(col("__h"), i + 16 * j).bitwiseAND(1L), 16 * j)
      }.reduce(_ + _)
      sum(contrib).as(s"__s$i")
    }
    val aggs = packedSums :+ count(lit(1)).as("__n")
    // unpack via ONE runtime fold over bit indices, not 64 inlined terms —
    // a 64-term OR select costs seconds of codegen compile per session
    exploded
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__sums", array((0 until 16).map(i => col(s"__s$i")): _*))
      .select(col("doc_id"),
        aggregate(
          sequence(lit(0), lit(63)),
          lit(0L),
          (acc, b) => {
            val lane = shiftleft(shiftright(b, 4), 4) // 16 * (b / 16)
            val cnt = call_function("shiftright",
              element_at(col("__sums"), (b.bitwiseAND(15) + 1).cast("int")),
              lane).bitwiseAND(0xFFFFL)
            acc.bitwiseOR(
              when(cnt * 2 > col("__n"),
                call_function("shiftleft", lit(1L), b)).otherwise(lit(0L)))
          }
        ).as("fp"))
  }

  /** SimHash near-dup candidates: band the 64-bit fingerprint into 4
    * 16-bit chunks (two fingerprints within Hamming distance 3 share at
    * least one exact chunk — classic pigeonhole blocking), self-join per
    * chunk, verify Hamming distance.
    */
  def simhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val fp = withSimhash(df, idCol, textCol)
    val chunked = fp.select(
      col("doc_id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("fp"), c * 16).bitwiseAND(0xFFFFL)))
        .as(Seq("chunk_id", "chunk"))
    )
    val a = chunked.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .dropDuplicates("id_a", "id_b")
  }
}
