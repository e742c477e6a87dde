package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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
}
