package graft.sources.v2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interop harness around [[RefIndexSource]]: materialize THIS engine's
  * postings in the reference's native `./index/<letter>` text format
  * once per (process, corpus), then serve queries through the V2 source
  * — proving the two engines can exchange an index on disk in the
  * reference's own representation.
  */
object RefIndexInterop {

  private val built = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Write the corpus postings in the reference's format
    * (`/root/reference/helper_reduce.c:238-256`: 26 files `a`…`z`, one
    * `term doc count` line per posting) through the V2 WRITER — a fully
    * distributed write: the write's required distribution clusters each
    * letter into one task, the required ordering sorts (term, doc_id)
    * within it, and the driver's two-phase commit renames the per-letter
    * temp files into place. The format's own one-file-per-letter design
    * is its scaling ceiling (which is why the main engine replaced it
    * with letter-partitioned parquet) — but the write is as parallel as
    * the format allows.
    */
  private[graft] def ensureRefIndex(spark: SparkSession, sfDir: String): String =
    built.getOrElseUpdate(sfDir, {
      val dir = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_refindex_" + Integer.toHexString(sfDir.hashCode))
      graft.util.Scratch.deleteRecursively(dir)
      Files.createDirectories(dir)
      graft.operators.Indexer.postings(spark, sfDir)
        .select(substring(col("term"), 1, 1).as("first_letter"),
          col("term"), col("doc_id"), col("tf"))
        .write
        .format(classOf[RefIndexSource].getName)
        .option("path", dir.toString)
        .mode("overwrite")
        .save()
      dir.toString
    })

  private def readRefIndex(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .format(classOf[RefIndexSource].getName)
      .option("path", ensureRefIndex(spark, sfDir))
      .load()

  /** Full scan back through the V2 source — hash-matching the batch
    * postings oracle proves the round-trip (engine → reference format →
    * engine) is lossless.
    */
  def refIndexScan(spark: SparkSession, sfDir: String): DataFrame =
    readRefIndex(spark, sfDir)
      .select("term", "doc_id", "tf") // column pruning reaches the reader
      .orderBy("term", "doc_id")

  /** Term lookup through the V2 source: the pushed `term = …` filter
    * prunes the scan to ONE letter file at planning time (the
    * reference's own `./index/<c>` seek), visible as a single input
    * partition in the plan.
    */
  def refIndexLookup(spark: SparkSession, sfDir: String,
                     term: String): DataFrame =
    readRefIndex(spark, sfDir)
      .filter(col("term") === term)
      .select("term", "doc_id", "tf")
      .orderBy("doc_id")
}
