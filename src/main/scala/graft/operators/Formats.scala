package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Columnar-format interchange beyond parquet. The reference's on-disk
  * format is bespoke text files (`/root/reference/helper_reduce.c:238`);
  * a lakehouse engine must read/write every mainstream columnar format
  * with identical semantics. Spark ships the ORC reader/writer alongside
  * parquet; the round-trip query proves schema, values, and encodings
  * survive the interchange — aggregated under the SAME oracle as the
  * parquet original, so any loss (string truncation, integer widening,
  * null handling) breaks the hash match.
  */
object Formats {

  private val scratch = new graft.util.ScratchSlot

  /** Stage the documents corpus as ORC, read it back, and aggregate the
    * ORC copy. Scratch handling as in [[Compaction.compactedRoundTrip]]:
    * one generation per call site, disposed on the next invocation.
    */
  def orcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    scratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_docs_")
    scratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val target = dir.resolve("docs").toString
    Tables.documents(spark, sfDir).write.mode("overwrite").orc(target)
    fingerprintAgg(spark.read.orc(target))
  }

  private val csvScratch = new graft.util.ScratchSlot

  /** The TEXT-format leg: corpus staged as headered CSV and read back
    * with an explicit schema (a schema-less CSV read would widen every
    * column to string — the interchange must restore TYPES, not just
    * bytes). Losslessness is pinned by OPTIONS, not by corpus invariants:
    * a distinct `nullValue` sentinel keeps NULL and "" apart (Spark's
    * default maps both to the empty token, so an empty text field would
    * silently read back as null), `emptyValue` forces "" to write as a
    * quoted pair so it can never collide with the sentinel, and
    * `multiLine` on the read side survives embedded newlines (the writer
    * already quotes them).
    */
  def csvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    csvScratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_docs_")
    csvScratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val target = dir.resolve("docs").toString
    Tables.documents(spark, sfDir)
      .write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      .csv(target)
    fingerprintAgg(spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .option("header", "true")
      .option("nullValue", "\\N")
      .option("multiLine", "true")
      .csv(target))
  }

  private val jsonScratch = new graft.util.ScratchSlot

  /** The JSON-lines leg: corpus staged as newline-delimited JSON and read
    * back with an explicit schema (schema inference would cost an extra
    * pass and could narrow all-integral doubles). JSON escaping makes
    * newlines/quotes lossless by construction; the writer omits null
    * fields and the reader restores absent fields as null, so null
    * round-trips too. The remaining JSON hazard — non-string types
    * widening through text — is exactly what the fingerprint's typed sums
    * would catch.
    */
  def jsonRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    jsonScratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_json_docs_")
    jsonScratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val target = dir.resolve("docs").toString
    Tables.documents(spark, sfDir).write.mode("overwrite").json(target)
    fingerprintAgg(spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .json(target))
  }

  /** The shared interchange fingerprint: per-lang counts, char totals,
    * distinct ids, and text lengths — any loss in any column moves it.
    */
  private def fingerprintAgg(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("doc_id")).as("n_distinct"),
        sum(length(col("text")).cast("bigint")).as("total_text_chars"))
      .orderBy("lang")

  private val evoScratch = new graft.util.ScratchSlot

  /** SCHEMA EVOLUTION read: an old data generation written without a
    * column and a new generation that added it, read together with
    * `mergeSchema` — the widened schema backfills the old files with
    * NULL, which the aggregate then distinguishes from real values
    * (`count(col)` vs `count(*)`). This is how a long-lived 100 TB table
    * actually looks: columns arrive mid-life and readers must span the
    * boundary without rewriting history. Footer-only schema merge; no
    * data is touched.
    */
  def schemaEvolutionRead(spark: SparkSession, sfDir: String): DataFrame = {
    evoScratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_schema_evo_")
    evoScratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val d = Tables.documents(spark, sfDir)
    val gen1 = dir.resolve("gen1").toString
    val gen2 = dir.resolve("gen2").toString
    d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(gen1)
    d.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(gen2)
    spark.read.option("mergeSchema", "true").parquet(gen1, gen2)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("n_chars")).as("n_with_chars"),
        sum(col("n_chars")).as("chars_sum"))
      .orderBy("lang")
  }
}
