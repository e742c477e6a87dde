package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document ingestion — the crawl-dump front door of a training-data
  * pipeline (one JSON object per line: web-crawl exports, API dumps).
  *
  * Schema is EXPLICIT, never inferred: inference costs a full extra pass
  * over 100 TB and silently re-types columns when a shard's values drift.
  * Malformed lines don't kill the job and aren't silently dropped either —
  * PERMISSIVE mode routes them to a `_corrupt_record` column so
  * [[readDocuments]] can split the batch into clean rows and a quarantine
  * side-output (count the quarantine, alert on drift, never lose data).
  */
object JsonCorpus {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** (clean documents, quarantined raw lines). Spark requires caching the
    * parsed batch before referencing `_corrupt_record` alone (the column
    * exists only during parsing); the cache covers both side-outputs with
    * one pass.
    */
  def readDocuments(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(DocSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val clean = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, quarantine)
  }
}
