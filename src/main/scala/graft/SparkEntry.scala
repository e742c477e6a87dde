package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching ANSI-SQL oracle in `oracleSql`
  * (run by the driver in DuckDB over the same parquet tables) unless the
  * operator is not SQL-expressible (then rows-only check). Column names and
  * row ordering are aligned engine-to-engine; doubles are rounded and money
  * aggregates use exact decimal arithmetic so value hashes match.
  */
object SparkEntry {

  /** Flagship: inverted-index build over the documents corpus — the entire
    * reference dataflow (`/root/reference/helper_map.c:166` →
    * `helper_reduce.c:153`) as one declarative plan. Driver smoke-checks
    * rows>0 at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Indexer.indexBuild(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_index_build"   -> ((s, d) => Indexer.indexBuild(s, d)),
    "q_term_lookup"   -> ((s, d) => Indexer.termLookup(s, d, "the")),
    "q_multi_term_and" -> ((s, d) => Indexer.multiTermAnd(s, d, Seq("scan", "join", "filter"))),
    "q_tfidf_topk"    -> ((s, d) => Indexer.tfIdfTopK(s, d, 5)),
    "q_vocab_stats"   -> ((s, d) => Indexer.vocabStats(s, d))
  )

  /** DuckDB oracle SQL. Tables referenced by bare name (`documents`, …) —
    * the driver materializes them from the same sf directory. Tokenization
    * is defined identically to [[graft.functions.TextFunctions.tokens]]:
    * split lower(text) on ' ', strip [^a-z], drop empties.
    */
  def oracleSql: Map[String, String] = {
    // shared CTE: postings(term, doc_id, tf)
    val postings =
      """WITH toks AS (
        |  SELECT doc_id,
        |         regexp_replace(unnest(string_split(lower(text), ' ')), '[^a-z]', '', 'g') AS term
        |  FROM documents
        |), postings AS (
        |  SELECT term, doc_id, count(*) AS tf FROM toks WHERE term <> '' GROUP BY term, doc_id
        |)""".stripMargin
    Map(
      "q_index_build" ->
        s"""$postings
           |SELECT substr(term, 1, 1) AS first_letter, term, doc_id, tf
           |FROM postings ORDER BY term, doc_id""".stripMargin,
      "q_term_lookup" ->
        s"""$postings
           |SELECT term, doc_id, tf FROM postings WHERE term = 'the'
           |ORDER BY tf DESC, doc_id""".stripMargin,
      "q_multi_term_and" ->
        s"""$postings
           |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_tf
           |FROM postings WHERE term IN ('scan', 'join', 'filter')
           |GROUP BY doc_id HAVING count(DISTINCT term) = 3
           |ORDER BY total_tf DESC, doc_id""".stripMargin,
      "q_tfidf_topk" ->
        s"""$postings, df AS (
           |  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
           |), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
           |SELECT term, doc_id, tf, tf_idf, rank FROM (
           |  SELECT p.term, p.doc_id, p.tf,
           |         round(p.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tf_idf,
           |         CAST(row_number() OVER (PARTITION BY p.term
           |           ORDER BY round(p.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) DESC, p.doc_id) AS INTEGER) AS rank
           |  FROM postings p JOIN df USING (term) CROSS JOIN n
           |) WHERE rank <= 5 ORDER BY term, rank""".stripMargin,
      "q_vocab_stats" ->
        s"""$postings
           |SELECT substr(term, 1, 1) AS first_letter,
           |       count(DISTINCT term) AS n_terms,
           |       count(DISTINCT doc_id) AS n_docs,
           |       CAST(sum(tf) AS BIGINT) AS total_tf
           |FROM postings GROUP BY 1 ORDER BY first_letter""".stripMargin
    )
  }
}
