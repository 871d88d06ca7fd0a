package graft.core

/** Column-set algebra across per-file headers (C4/U4 in the survey;
  * reference utils.py:1-64): diagnose schema drift across files.
  */
object ColumnSets {

  /** Columns present in every file. */
  def intersection(perFile: Seq[Seq[String]]): Set[String] =
    if (perFile.isEmpty) Set.empty
    else perFile.map(_.toSet).reduce(_ intersect _)

  /** Columns present in at least one file. */
  def union(perFile: Seq[Seq[String]]): Set[String] =
    perFile.foldLeft(Set.empty[String])(_ ++ _.toSet)

  /** Columns that appear in exactly one file (the drift signal). */
  def appearsInExactlyOne(perFile: Seq[Seq[String]]): Set[String] = {
    val counts = perFile.flatMap(_.distinct).groupBy(identity)
    counts.collect { case (c, occ) if occ.size == 1 => c }.toSet
  }

  /** Per-file missing columns relative to the union (file -> missing set). */
  def missingByFile(perFile: Map[String, Seq[String]]): Map[String, Set[String]] = {
    val all = union(perFile.values.toSeq)
    perFile.map { case (f, cols) => f -> (all -- cols.toSet) }
  }
}
