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
    spark.read.orc(target)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("doc_id")).as("n_distinct"),
        sum(length(col("text")).cast("bigint")).as("total_text_chars"))
      .orderBy("lang")
  }
}
