package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (the Great-Expectations /
  * dbt-test shape): each rule audits one invariant and yields ONE row
  * `(rule, n_checked, n_violations, pass)`; a suite is the union of rule
  * rows. The audit a training-data pipeline runs before promoting a drop.
  *
  * Scale shape: every rule is a full-scan AGGREGATE (map-side combinable,
  * one row out — never a materialized violation list; pair with a
  * `.filter(!pred)` sample query to inspect actual offenders), and the
  * referential rule is a single left join counted in the same pass.
  * Violation semantics: a row where the predicate is NULL (e.g. a null
  * operand in a range check) counts as a violation — audits must be
  * pessimistic.
  *
  * Reference behavior modeled: the reference's per-file validation report
  * (structure/continuity checks, time_series_loader/load_file.py) —
  * generalized to arbitrary predicates and cross-table invariants.
  */
object Expectations {

  /** Predicate rule: `pred` must hold on every row of `df`. */
  def expect(name: String, df: DataFrame, pred: Column): DataFrame =
    df.agg(
        count(lit(1)).as("n_checked"),
        coalesce(
          sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)),
          lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))

  /** Uniqueness rule: no duplicate values of `cols` (row count minus
    * distinct count).
    */
  def expectUnique(name: String, df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
        count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(cols.head, cols.tail: _*))
          .as("n_violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))

  /** Referential rule: every `child.key` resolves in `parent.pkey`
    * (null keys count as violations). Parent side is deduped and joined
    * once; broadcast it when the parent is a dim table.
    */
  def expectForeignKey(
      name: String,
      child: DataFrame,
      key: String,
      parent: DataFrame,
      pkey: String
  ): DataFrame =
    child
      .select(col(key).as("__k"))
      .join(
        parent.select(col(pkey).as("__pk")).distinct()
          .withColumn("__hit", lit(1)),
        col("__k") === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_checked"),
        coalesce(
          sum(when(col("__hit").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))

  /** Combine rule rows into the suite report, `pass` per rule. */
  def suite(rules: Seq[DataFrame]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    rules
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
