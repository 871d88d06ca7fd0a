package graft.ops

/** DuckDB replay of [[Bpe]] training: the merge rounds unroll into CTEs
  * (exactly like `IvfSql.lloydCtes` unrolls Lloyd iterations), so the
  * oracle re-derives every winning pair, every merged vocab state, and
  * the base-alphabet expansions from the raw `documents` table. All
  * arithmetic is integer (counts) and all string ops (`replace`,
  * `substr`, `length`, binary-UTF-8 ordering) behave identically in
  * Spark and DuckDB, so the replay is hash-exact.
  */
object BpeSql {

  /** toks / wc / v0 prefix: tokenize, count `[a-z]+` words, suffix the
    * end-of-word marker. `v0` carries `w0` so the encode oracle can join
    * the corpus back against the trained vocab.
    */
  private def prefix: String =
    """toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                            x -> len(x) > 0)) AS tok
      |  FROM documents),
      |wc AS MATERIALIZED (
      |  SELECT tok AS w0, CAST(count(*) AS BIGINT) AS f FROM toks
      |  WHERE regexp_full_match(tok, '[a-z]+') GROUP BY tok),
      |v0 AS MATERIALIZED (SELECT w0, w0 || '_' AS w, f FROM wc)""".stripMargin

  /** One round: overlapping pair counts of v{r}, argmax with
    * lexicographic tie-break, greedy merge into v{r+1} via `replace`
    * with the round's private-use symbol, plus e{r} = base-alphabet
    * expansion of the winning pair (recursing through earlier e{k}).
    */
  private def roundCtes(r: Int): String = {
    val m = 57344 + r
    s"""p$r AS MATERIALIZED (
       |  SELECT pr, CAST(sum(f) AS BIGINT) AS cnt FROM (
       |    SELECT f, unnest(list_transform(range(1, length(w)),
       |                                    i -> substr(w, i, 2))) AS pr
       |    FROM v$r)
       |  GROUP BY pr),
       |m$r AS MATERIALIZED (SELECT pr, cnt FROM p$r ORDER BY cnt DESC, pr LIMIT 1),
       |e$r AS MATERIALIZED (SELECT ${expand("substr(pr, 1, 1)", r)} ||
       |               ${expand("substr(pr, 2, 1)", r)} AS x FROM m$r),
       |v${r + 1} AS MATERIALIZED (
       |  SELECT w0, replace(w, (SELECT pr FROM m$r), chr($m)) AS w, f
       |  FROM v$r)""".stripMargin
  }

  /** Expansion of a single-symbol SQL expression back to base chars:
    * private-use symbols dispatch to the earlier round's e{k}.
    */
  private def expand(sym: String, r: Int): String =
    if (r == 0) sym
    else {
      val whens = (0 until r)
        .map(k => s"WHEN ${57344 + k} THEN (SELECT x FROM e$k)")
        .mkString(" ")
      s"(CASE unicode($sym) $whens ELSE $sym END)"
    }

  /** Full `doc_bpe_merges` oracle: n rounds, one row per learned merge. */
  def mergesSql(n: Int): String = {
    val ctes = (prefix +: (0 until n).map(roundCtes)).mkString(",\n")
    val rows = (0 until n).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_rank,
         |       ${expand("substr(pr, 1, 1)", r)} AS lhs,
         |       ${expand("substr(pr, 2, 1)", r)} AS rhs,
         |       (SELECT x FROM e$r) AS merged,
         |       cnt AS pair_count
         |FROM m$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\nSELECT * FROM (\n$rows\n) ORDER BY merge_rank"
  }

  /** Full `doc_bpe_encode` oracle: train n rounds, then re-join the
    * corpus tokens against the final vocab's symbol counts.
    */
  def encodeSql(n: Int): String = {
    val ctes = (prefix +: (0 until n).map(roundCtes)).mkString(",\n")
    s"""WITH $ctes,
       |enc AS MATERIALIZED (SELECT w0, CAST(length(w) AS BIGINT) AS n_sym FROM v$n),
       |d AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\s+'),
       |    x -> len(x) > 0)) AS tok
       |  FROM documents)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(length(tok)) AS BIGINT) AS n_chars,
       |       CAST(sum(n_sym) AS BIGINT) AS n_bpe
       |FROM d JOIN enc ON enc.w0 = d.tok
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** [[encodeSql]] rolled up per language: corpus fertility (BPE symbols
    * per word) and compression (chars per symbol) in exact integer ppm.
    */
  def fertilitySql(n: Int): String = {
    val ctes = (prefix +: (0 until n).map(roundCtes)).mkString(",\n")
    s"""WITH $ctes,
       |enc AS MATERIALIZED (SELECT w0, CAST(length(w) AS BIGINT) AS n_sym FROM v$n),
       |d AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\s+'),
       |    x -> len(x) > 0)) AS tok
       |  FROM documents),
       |per AS (
       |  SELECT doc_id,
       |         CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(length(tok)) AS BIGINT) AS n_chars,
       |         CAST(sum(n_sym) AS BIGINT) AS n_bpe
       |  FROM d JOIN enc ON enc.w0 = d.tok
       |  GROUP BY doc_id)
       |SELECT lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(per.n_words) AS BIGINT) AS n_words,
       |       CAST(sum(per.n_chars) AS BIGINT) AS n_chars,
       |       CAST(sum(per.n_bpe) AS BIGINT) AS n_bpe,
       |       CAST(sum(per.n_bpe) AS BIGINT) * 1000000
       |         // CAST(sum(per.n_words) AS BIGINT) AS fertility_ppm,
       |       CAST(sum(per.n_chars) AS BIGINT) * 1000000
       |         // CAST(sum(per.n_bpe) AS BIGINT) AS chars_per_sym_ppm
       |FROM per JOIN documents USING (doc_id)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }
}
