package graft.sources.v2

import java.nio.charset.StandardCharsets
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
    * `term doc count` line per posting). The per-letter driver-side
    * write is FORMAT-FAITHFUL, not a scale compromise — the format
    * itself serializes each letter through a single appended file, which
    * is exactly its scaling ceiling (and why the main engine replaced it
    * with letter-partitioned parquet).
    */
  private[graft] def ensureRefIndex(spark: SparkSession, sfDir: String): String =
    built.getOrElseUpdate(sfDir, {
      val dir = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_refindex_" + Integer.toHexString(sfDir.hashCode))
      graft.util.Scratch.deleteRecursively(dir)
      Files.createDirectories(dir)
      val rows = graft.operators.Indexer.postings(spark, sfDir)
        .select(col("term"), col("doc_id"), col("tf"))
        .orderBy("term", "doc_id")
        .collect()
      rows.groupBy(_.getString(0).substring(0, 1)).foreach {
        case (letter, rs) =>
          val body = rs.map(r =>
            s"${r.getString(0)} ${r.getLong(1)} ${r.getLong(2)}\n").mkString
          Files.write(dir.resolve(letter),
            body.getBytes(StandardCharsets.UTF_8))
      }
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
    readRefIndex(spark, sfDir).orderBy("term", "doc_id")

  /** Term lookup through the V2 source: the pushed `term = …` filter
    * prunes the scan to ONE letter file at planning time (the
    * reference's own `./index/<c>` seek), visible as a single input
    * partition in the plan.
    */
  def refIndexLookup(spark: SparkSession, sfDir: String,
                     term: String): DataFrame =
    readRefIndex(spark, sfDir)
      .filter(col("term") === term)
      .orderBy("doc_id")
}
