package graft

/** Per-query wall-clock budgets: SCALE.md pins plan SHAPES, this pins plan
  * TIMES — without it a 2× single-query regression hides inside a
  * 229-query total (the round-5 lesson: a uniform session-level drift was
  * only visible because two rounds were hand-diffed).
  *
  * `BUDGETS.json` (repo root) maps query name → ceiling seconds at sf0.1
  * on the driver box (local[32], best-of-2), set at ~2× the measured time
  * when the budget was minted. [[Bench]] evaluates every run against it
  * and emits violations in its JSON line; queries newer than the budgets
  * file simply aren't checked (they get a ceiling when the file is next
  * regenerated).
  *
  * The file is flat string→number JSON, parsed with a regex rather than a
  * JSON library — the library has zero runtime deps beyond Spark, and the
  * file is repo-controlled.
  */
object BudgetCheck {

  /** name → ceiling seconds. Missing/unreadable file → empty (no checks). */
  def load(path: java.nio.file.Path): Map[String, Double] =
    if (!java.nio.file.Files.isReadable(path)) Map.empty
    else parse(java.nio.file.Files.readString(path))

  private[graft] def parse(json: String): Map[String, Double] = {
    val entry = """"([^"]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)""".r
    entry.findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Queries whose measured best-of-N seconds exceed their ceiling.
    * Unknown queries (no budget row) pass — a new operator must not fail
    * the bench before the budgets file learns about it.
    */
  def violations(
      measured: Map[String, Double],
      budgets: Map[String, Double]
  ): Map[String, (Double, Double)] =
    measured.flatMap { case (name, sec) =>
      budgets.get(name).collect {
        case ceiling if sec > ceiling => name -> ((sec, ceiling))
      }
    }

  /** Render `{"name":{"sec":1.2,"budget":0.6},...}` for the bench line. */
  def toJson(v: Map[String, (Double, Double)]): String =
    v.toSeq.sortBy(_._1)
      .map { case (k, (sec, b)) => s""""$k":{"sec":$sec,"budget":$b}""" }
      .mkString("{", ",", "}")
}
