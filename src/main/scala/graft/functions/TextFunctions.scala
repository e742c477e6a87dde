package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / normalization primitives, defined ONCE so every operator
  * (indexing, dedup, text stats) and every DuckDB oracle query agree on
  * token semantics.
  *
  * Reference semantics (`/root/reference/helper_map.c:166`,
  * `/root/reference/WordCount.java:45-47`): split on whitespace, lowercase,
  * strip `[^a-z]`. Deliberate fix vs the reference (SURVEY.md §7.0): tokens
  * that normalize to "" are DROPPED (the reference counts them).
  *
  * Everything here is `org.apache.spark.sql.functions._` built-ins —
  * codegen'd, no UDFs — so tokenize→explode→aggregate stays inside
  * WholeStageCodegen at any scale.
  */
object TextFunctions {

  /** Array of normalized tokens of a text column.
    * Spark:  filter(transform(split(lower(t), ' '), strip), _ != '')
    * DuckDB: list_filter(list_transform(string_split(lower(t), ' '), strip), _ <> '')
    */
  def tokens(text: Column): Column =
    filter(
      transform(split(lower(text), " "), w => regexp_replace(w, "[^a-z]", "")),
      w => w =!= ""
    )

  /** One row per normalized token (P1+P2+P3+P4 of SURVEY.md §2). */
  def explodedTokens(text: Column): Column = explode(tokens(text))

  /** Reference-faithful tokens for RAW multi-line corpus files: split on
    * space OR newline — exactly what `tr ' ' '\n'` plus line-based
    * counting does (`/root/reference/helper_map.c:166`). Note a tab does
    * NOT separate tokens there (it is stripped by the `[^a-z]` filter,
    * merging its neighbors) and so it doesn't here either; `\r` of CRLF
    * line ends is likewise stripped. [[tokens]] (single-space split)
    * remains the oracle-parity tokenizer for the single-line synthetic
    * corpus — both are asserted against independent ground truth.
    */
  def corpusTokens(text: Column): Column =
    filter(
      transform(split(lower(text), "[ \n]"), w => regexp_replace(w, "[^a-z]", "")),
      w => w =!= ""
    )

  /** Token count per document. */
  def numTokens(text: Column): Column = size(tokens(text))

  /** Partition key of the reference's 26-file master index
    * (`/root/reference/helper_reduce.c:238-242`): first letter of the term.
    */
  def firstLetter(term: Column): Column = substring(term, 1, 1)

  /** Document name derivation per `/root/reference/worker.c:285-302`:
    * strip directories, then strip the extension at the FIRST dot of the
    * basename ("Tolstoy/war_and_peace.txt" -> "war_and_peace").
    */
  def docName(path: Column): Column =
    regexp_extract(path, "([^/.]+)[^/]*$", 1)

  /** Word n-gram shingles of a text column (duplicates kept; wrap in
    * `array_distinct` for set semantics). Empty array when fewer than n
    * tokens — `sequence(1, k)` with k < 1 would count DOWN, so guard it.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** Shingles from an already-tokenized array column. Prefer computing the
    * token array in its OWN projection and passing it here: `ts` is
    * referenced three times, and if it's an inline `tokens(text)` call the
    * whole tokenize tree gets triplicated in the fused stage (Catalyst
    * doesn't CSE it), which at corpus scale is the difference between one
    * and three regex passes per row.
    */
  def shinglesOfTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => array_join(slice(ts, i, lit(n)), " "))
    ).otherwise(array().cast("array<string>"))
}
