package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.docName

/** Raw text-file corpus source — the reference's actual input format
  * (`./data/<author>/<title>` plain-text files, scanned char-at-a-time in
  * `/root/reference/worker.c:188-205`).
  *
  * `spark.read.text` with `wholetext` gives one row per file;
  * `input_file_name()` supplies the identity the reference threads through
  * its socket protocol, and [[docName]] reproduces the
  * `get_origin_name` derivation (`worker.c:285-302`): basename minus
  * extension. Splitting a large file across tasks (S2,
  * `split_file` `worker.c:179-229`) is `FileSourceScanExec`'s job —
  * word-boundary handling and all.
  */
object TextCorpus {

  /** One row per document: (doc_name, path, text). Hadoop globs treat
    * `**` like `*`, so recursion needs the explicit option.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .text(dir)
      .select(
        docName(input_file_name()).as("doc_name"),
        input_file_name().as("path"),
        col("value").as("text"))

  /** Postings straight from a raw text corpus — the full reference
    * pipeline on its native input format, with the reference's own
    * space-or-newline token semantics ([[graft.functions.TextFunctions.corpusTokens]]).
    * Asserted token-for-token against the reference's shell pipeline on
    * its real 14.5 MB corpus in GoldenCorpusSpec.
    */
  def postings(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    read(spark, dir)
      .select(col("doc_name"), explode(corpusTokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_name"))
      .agg(count(lit(1)).as("tf"))
  }
}
