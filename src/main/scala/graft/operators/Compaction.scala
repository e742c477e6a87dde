package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Small-file compaction — the operational chore every long-lived 100 TB
  * lake needs: streaming sinks and incremental upserts leave directories
  * of KB-sized parquet files, and scan cost degrades with file COUNT
  * (task scheduling, footer reads, no intra-file parallelism), not bytes.
  *
  * `compact` rewrites a parquet directory into ⌈bytes/target⌉ files via a
  * single coalesce-write: `coalesce` (not `repartition`) merges existing
  * partitions WITHOUT a shuffle, so the rewrite is a pure read→write
  * pipeline. The rewrite goes to a sibling temp dir first and swaps in
  * with two renames — readers never observe a half-written directory.
  */
object Compaction {

  final case class Result(filesBefore: Int, filesAfter: Int, bytes: Long)

  def compact(spark: SparkSession, dir: String,
              targetBytes: Long): Result = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val tmp = new Path(path.getParent, path.getName + "._compact_tmp")
    spark.read.parquet(dir)
      .coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)

    val old = new Path(path.getParent, path.getName + "._compact_old")
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)
    Result(before.length, parquetFiles.length, bytes)
  }

  /** The compaction lifecycle as one oracle-checkable query: fragment the
    * documents corpus into 64 small files (what a streaming sink or
    * upsert-heavy table looks like), compact the directory down with the
    * rename-swap rewrite, and aggregate the COMPACTED copy. The oracle
    * runs the same aggregation over the original table, so a hash match
    * proves the shuffle-free coalesce rewrite and the two-rename swap
    * preserved every row — compaction is a physical concern; the answer
    * must not move.
    */
  private val scratch = new graft.util.ScratchSlot

  def compactedRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    scratch.retire() // previous run's fragment+compact dir, consumed by now
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_docs_")
    scratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val target = dir.resolve("docs").toString
    Tables.documents(spark, sfDir)
      .repartition(64)
      .write.mode("overwrite").parquet(target)
    val r = compact(spark, target, 64L * 1024 * 1024)
    require(r.filesAfter < r.filesBefore,
      s"compaction did not reduce file count: $r")
    spark.read.parquet(target)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("doc_id")).as("n_distinct"))
      .orderBy("lang")
  }
}
