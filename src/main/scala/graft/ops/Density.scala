package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-blocked DBSCAN over integer 2-D points — density clustering with
  * noise, the shape-agnostic complement of the k-means/SemDeDup family
  * (clusters of arbitrary shape, outliers surfaced instead of absorbed).
  *
  * The 100 TB shape: points hash into eps-sized grid cells, so the
  * neighbor join is an EQUI-join on cell keys (each point probes its 3×3
  * cell neighborhood — a 9× map-side fan-out, never a distance cross
  * join); everything after runs at neighbor-pair cardinality, and the
  * component closure on core-core edges reuses [[Dedup]]'s bounded
  * min-label propagation. Density (avg neighbors per cell) is the knob
  * that keeps per-cell buckets bounded — the same degenerate-bucket
  * contract as the LSH band joins.
  *
  * Determinism contract: coordinates are exact integers, eps² compares
  * are exact int64, cluster label = min core id of the component, and a
  * border point joins the MINIMUM cluster label among its core neighbors
  * (classic DBSCAN leaves border assignment order-dependent; this
  * variant pins it).
  */
object Density {

  /** Returns one row per input point: (id, role ∈ core|border|noise,
    * cluster = min core id of its cluster, null for noise).
    *
    * ==Scale policy (`maxCellSize`)==
    * Fixed-eps DBSCAN on a plane that DENSIFIES as the corpus grows is
    * inherently super-linear: candidate pairs grow with per-cell
    * population squared, by definition of the operator (measured 22× work
    * for 10× data at the sf1 probe — SCALE.md). `maxCellSize = Some(cap)`
    * is the production knob, the exact analogue of the LSH band joins'
    * `maxBucketSize`: each grid cell contributes at most `cap` points —
    * the lowest ids, deterministically — as JOIN TARGETS, so total
    * neighbor-pair work is bounded by `9 · cap · n` (linear in n at any
    * density) while every point still probes and gets a role.
    *
    * Completeness trade, stated: neighbor COUNTS become lower bounds in
    * cells denser than `cap`, so relative to the exact run the core set
    * can only SHRINK and the noise set only GROW (monotone degradation,
    * spec-pinned in DensitySpec); an over-cap cell already holds ≥ cap ≥
    * minPts candidates within eps·√2, so genuinely dense regions keep
    * their clusters. What the cap forfeits beyond fringe membership:
    * cluster LABELS may fragment — a core-core link whose endpoints are
    * BOTH capped out of their cells is invisible to the component build
    * (a neighbor pair materializes only when its home-side point is
    * retained), so one exact cluster can surface as several. The
    * one-row-per-point contract always holds. `None` (default) is the
    * exact operator and what the
    * `emb_dbscan` oracle gate runs; alternatives for a growing corpus are
    * scaling eps DOWN with density, or treating the exact form as a
    * bounded-subset diagnostic like the brute-force oracle baselines.
    */
  def dbscan2d(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      eps: Long,
      minPts: Int,
      maxCellSize: Option[Int] = None,
      blocks: Int = 1
  ): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    maxCellSize.foreach(c => require(c >= minPts,
      s"maxCellSize $c < minPts $minPts would erase every dense cell"))
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    require(blocks == 1 || maxCellSize.isEmpty,
      "blocked passes are the exact-mode out-of-core path; maxCellSize " +
        "already bounds pair volume — combine them and the asymmetric-nbr " +
        "orientation logic silently breaks")
    val p0 = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    // shift to non-negative so `div eps` is a true floor grid (truncating
    // division would make the cell straddling 0 twice as wide)
    val b = broadcast(p0.agg(min(col("x")).as("mx"), min(col("y")).as("my")))
    val p = p0.crossJoin(b)
      .select(col("id"), (col("x") - col("mx")).as("x"),
        (col("y") - col("my")).as("y"))
      .localCheckpoint(true)
    val homeAll = p.select(col("id"), col("x"), col("y"),
      expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))
    // scale policy: bound each cell's JOIN-TARGET population (see scaladoc);
    // the probe side stays complete so every point is still classified
    val home = maxCellSize match {
      case None => homeAll
      case Some(cap) => homeAll
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("cx"), col("cy")).orderBy(col("id"))))
        .filter(col("__rn") <= cap)
        .drop("__rn")
    }
    val offsets = Seq(-1L, 0L, 1L)
    val probe = homeAll.select(col("id").as("pid"), col("x").as("px"),
        col("y").as("py"),
        explode(array(offsets.flatMap(dx => offsets.map(dy =>
          struct((col("cx") + dx).as("ccx"), (col("cy") + dy).as("ccy")))): _*))
          .as("__c"))
      .select(col("pid"), col("px"), col("py"),
        col("__c.ccx").as("cx"), col("__c.ccy").as("cy"))
    if (blocks > 1)
      return blockedExact(p, homeAll, eps, minPts, blocks)
    // neighbor pairs (symmetric, includes self at distance 0); |dx| < 2·eps
    // inside adjacent cells so the squared terms never overflow
    val nbr = probe.join(home, Seq("cx", "cy"))
      .filter((col("px") - col("x")) * (col("px") - col("x")) +
        (col("py") - col("y")) * (col("py") - col("y")) <= lit(eps * eps))
      .select(col("pid"), col("id"))
      .localCheckpoint(true)
    val core = nbr.groupBy(col("pid")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minPts)
      .select(col("pid").as("id"))
      .localCheckpoint(true)
    // orientation-insensitive canonical pairs: under maxCellSize nbr is
    // ASYMMETRIC (probe side complete, home side capped), so a pair
    // between a capped-out core and a retained core may exist only as
    // (high-id probe, low-id home) — a `pid < id` pre-filter would drop
    // it and strand the capped-out core as a spurious singleton cluster.
    // least/greatest canonicalization keeps whichever orientation
    // survived; distinct restores the one-row-per-undirected-edge
    // cardinality the component build's driverMaxEdges contract assumes.
    val coreEdges = nbr.filter(col("pid") =!= col("id"))
      .join(core.select(col("id").as("pid")), Seq("pid"))
      .join(core, Seq("id"))
      .select(least(col("pid"), col("id")).as("id_a"),
        greatest(col("pid"), col("id")).as("id_b"))
      .distinct()
    // isolated cores (no core neighbor) fall back to their own id as label.
    // density components are long thin ridges (diameter ~O(cluster size),
    // unlike near-dup cliques) — the shape that overran a per-EDGE-hop
    // round budget at 30x (ScaleSelfCheck split_core_edges, round 9); the
    // contraction build converges in O(log n) LEVELS, so 48 is a deep
    // safety margin, not a diameter bound
    val labels = Dedup.components(coreEdges, maxIter = 48)
    val coreLab = core.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster"),
        lit("core").as("role"))
      .localCheckpoint(true)
    // consumed twice (output union + the noise anti-join): pay the label
    // join / neighbor aggregation once
    val borderLab = nbr
      .join(core.select(col("id").as("pid")), Seq("pid"), "left_anti")
      .join(coreLab.select(col("id"), col("cluster")), Seq("id"))
      .groupBy(col("pid"))
      .agg(min(col("cluster")).as("cluster"))
      .select(col("pid").as("id"), col("cluster"), lit("border").as("role"))
      .localCheckpoint(true)
    // noise = everything not assigned a role above. Deriving it from
    // "has a core neighbor in nbr" is WRONG under maxCellSize: a capped-out
    // point can be core (it probes the complete population) while none of
    // its RETAINED in-home neighbors is core, so it would be re-emitted as
    // noise on top of its core row. Two sequential anti-joins against the
    // assigned id sets keep the contract (and keep a 2-child union off a
    // join's build side — the shape where Spark 4.1's
    // unionOutputPartitioning=true default mis-claims a child's hash
    // partitioning for the physically concatenated RDD and a downstream
    // sort-merge join dies with "Can't zip RDDs with unequal numbers of
    // partitions"; hit at the sf1 scale probe, see SCALE.md)
    val noise = p.select(col("id"))
      .join(core, Seq("id"), "left_anti")
      .join(borderLab.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(null).cast("long").as("cluster"),
        lit("noise").as("role"))
    coreLab.unionByName(borderLab).unionByName(noise)
      .select(col("id"), col("role"), col("cluster"))
  }

  /** Out-of-core EXACT DBSCAN (round 13): the same operator as the
    * single-pass exact form — labels are bit-identical (DensitySpec pins
    * it) — but the candidate-PAIR space is never materialized.
    *
    * Why: fixed-eps exact DBSCAN on a densifying plane is ~quadratic in
    * SF (measured 7,639× intra-cell pairs for 100× points, SCALE.md round
    * 12); the single-pass plan checkpoints the full neighbor-pair table
    * (~872M rows ≈ 100 GB of shuffle+spill at sf10) and died on a 76 GB
    * scratch disk four times. Here the eps-grid cells are hashed into
    * `blocks` disjoint groups and each group runs as its OWN sequential
    * pass: both join inputs are filtered to the group's cells BEFORE any
    * exchange (shuffle per pass = O(n/blocks) point rows, never pairs),
    * and the pass's pair stream flows straight into a map-side-combined
    * aggregation (neighbor counts) or an already-canonical edge filter —
    * the only pair-derived bytes that ever persist are n count rows and
    * the within-eps core-core EDGE list, parquet'd to scratch (~16 B/edge
    * vs the pair table's full coordinate payload). Peak scratch is
    * bounded by the largest single pass, ~1/blocks of the old footprint.
    *
    * Two sweeps over the pair space (counts, then edges+borders — the
    * edge sweep needs the core set, which needs the counts) ⇒ ~2× the
    * distance-compute of the single pass; CPU for disk is the trade that
    * makes 100× feasible. On a cluster the same structure runs one pass
    * per job with executor-local scratch.
    *
    * Edge-set exactness: the exact nbr relation is SYMMETRIC, so keeping
    * only `pid < id` core-core orientations yields each undirected edge
    * exactly once — and exactly one pass emits it (the pass owning the
    * home side's cell), so no cross-pass distinct is needed. Border
    * candidates (non-core probe, core home) are NOT canonicalized: a
    * non-core point has < minPts neighbors by definition, so that side
    * is ≤ minPts·|noncore| rows — negligible.
    */
  private def blockedExact(
      p: DataFrame,
      home: DataFrame,
      eps: Long,
      minPts: Int,
      blocks: Int
  ): DataFrame = {
    val spark = p.sparkSession
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-dbscan-oocore").toString
    val dist2Ok = (col("px") - col("x")) * (col("px") - col("x")) +
      (col("py") - col("y")) * (col("py") - col("y")) <= lit(eps * eps)
    val offsets = Seq(-1L, 0L, 1L)
    def blockOf(cx: Column, cy: Column): Column =
      pmod(hash(cx, cy), lit(blocks))
    def probeOf(h: DataFrame, extra: Seq[Column]): DataFrame =
      h.select((Seq(col("id").as("pid"), col("x").as("px"),
          col("y").as("py")) ++ extra :+
          explode(array(offsets.flatMap(dx => offsets.map(dy =>
            struct((col("cx") + dx).as("ccx"), (col("cy") + dy).as("ccy")))): _*))
            .as("__c")): _*)
        .withColumn("cx", col("__c.ccx")).withColumn("cy", col("__c.ccy"))
        .drop("__c")

    // sweep 1: per-point neighbor counts (self included, as single-pass)
    val probe1 = probeOf(home, Nil)
    (0 until blocks).foreach { b =>
      probe1.filter(blockOf(col("cx"), col("cy")) === b)
        .join(home.filter(blockOf(col("cx"), col("cy")) === b),
          Seq("cx", "cy"))
        .filter(dist2Ok)
        .groupBy(col("pid")).agg(count(lit(1)).as("n"))
        .write.mode("append").parquet(s"$scratch/counts")
    }
    val core = spark.read.parquet(s"$scratch/counts")
      .groupBy(col("pid")).agg(sum(col("n")).as("n"))
      .filter(col("n") >= minPts)
      .select(col("pid").as("id"))
      .localCheckpoint(true)

    // sweep 2: core flags ride the POINT tables (n-row join, paid once),
    // so the pair stream shuffles nothing — it filters straight to disk
    val homeC = home
      .join(core.select(col("id"), lit(true).as("__hc")), Seq("id"), "left")
      .withColumn("__hc", coalesce(col("__hc"), lit(false)))
      .localCheckpoint(true)
    val probeC = probeOf(homeC, Seq(col("__hc").as("__pc")))
    (0 until blocks).foreach { b =>
      probeC.filter(blockOf(col("cx"), col("cy")) === b)
        .join(homeC.filter(blockOf(col("cx"), col("cy")) === b),
          Seq("cx", "cy"))
        .filter(dist2Ok && col("__hc") && col("pid") =!= col("id") &&
          (!col("__pc") || col("pid") < col("id")))
        .select(col("pid"), col("id"), col("__pc").as("core_probe"))
        .write.mode("append").parquet(s"$scratch/adj")
    }
    val adj = spark.read.parquet(s"$scratch/adj")
    val coreEdges = adj.filter(col("core_probe"))
      .select(col("pid").as("id_a"), col("id").as("id_b"))
    val labels = Dedup.components(coreEdges, maxIter = 48)
    val coreLab = core.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster"),
        lit("core").as("role"))
      .localCheckpoint(true)
    val borderLab = adj.filter(!col("core_probe"))
      .join(coreLab.select(col("id"), col("cluster")), Seq("id"))
      .groupBy(col("pid")).agg(min(col("cluster")).as("cluster"))
      .select(col("pid").as("id"), col("cluster"), lit("border").as("role"))
      .localCheckpoint(true)
    val noise = p.select(col("id"))
      .join(core, Seq("id"), "left_anti")
      .join(borderLab.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(null).cast("long").as("cluster"),
        lit("noise").as("role"))
    // eager checkpoint so scratch can be reclaimed before the caller
    // consumes the (n-row) result
    val out = coreLab.unionByName(borderLab).unionByName(noise)
      .select(col("id"), col("role"), col("cluster"))
      .localCheckpoint(true)
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(scratch))
    try walk.iterator().asScala.toSeq.sortBy(pp => -pp.getNameCount)
      .foreach(pp => java.nio.file.Files.deleteIfExists(pp))
    finally walk.close()
    out
  }
}
