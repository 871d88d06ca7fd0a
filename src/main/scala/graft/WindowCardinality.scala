package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Empirical prover for the [[PlanSnapshot.BoundedGlobalWindows]] allowlist
  * (VERDICT r12 next #2).
  *
  * The allowlist carries CLAIMED cardinality bounds ("distinct-VALUE cell
  * table", "timeline-buckets-bounded") that justify the one-task-for-100TB
  * shape of each unpartitioned window — but a claim is not a measurement,
  * and some entries could plausibly track SF (rel_ab_ks distinct-value
  * cells, ts_kaplan_meier distinct lifetimes). This main executes each
  * allowlisted query's physical plan, locates every WindowExec with an
  * empty partitionSpec, and COUNTS the rows feeding it (re-executing the
  * window's child subtree — exact, not estimated). Run at sf0.1 / sf1 /
  * sf10 and diff: a bound that holds is a flat or sub-linear row count
  * across decades; a bound that tracks SF is a failed claim and that query
  * must move to the RangeSeries chunked spine.
  *
  * Usage: scripts/run.sh graft.WindowCardinality <sfDir> [query...]
  * Output: one line per (query, window): `WINCARD <query> <idx> <rows>`
  * plus a trailing JSON object for SCALE.md tables.
  */
object WindowCardinality {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WindowCardinality <sfDir> [query...]")
    val sfDir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else PlanSnapshot.BoundedGlobalWindows.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false")
      // AQE off: the probe needs the static plan so WindowExec children are
      // directly re-executable subtrees (same determinism pin as
      // PlanSnapshot — this is a plan-shape measurement, not a perf run)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // measure the SCALE plan: the small-input fast path would bypass the
    // chunked spine at low SF and hide the window the allowlist is about
    spark.conf.set("graft.rangeSeries.fastPathRows", "0")
    spark.conf.set("graft.rangeSeries.fastPathBytes", "0")

    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val wins = df.queryExecution.executedPlan.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      val counts = wins.zipWithIndex.map { case (w, i) =>
        // exact input cardinality: re-execute just the child subtree
        val n = w.child.execute().count()
        println(s"WINCARD $name $i $n")
        n
      }
      if (wins.isEmpty) println(s"WINCARD $name - NONE (no unpartitioned window in plan)")
      name -> counts
    }
    val json = results.map { case (n, cs) =>
      s""""$n":[${cs.mkString(",")}]"""
    }.mkString("{", ",", "}")
    println(s"WINCARD_JSON $json")
    spark.stop()
  }
}
