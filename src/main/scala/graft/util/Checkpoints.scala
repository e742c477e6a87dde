package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage truncation for plans that re-consume an intermediate from
  * several branches (iterative CC rounds, multi-branch orientations,
  * re-annotated postings): `localCheckpoint` by default — fast,
  * executor-local blocks — or RELIABLE `checkpoint` into
  * `spark.graft.checkpointDir` when set (shared storage on a cluster,
  * where an executor loss mid-build must recompute from the checkpoint
  * instead of failing the job). The first caller wins the
  * SparkContext-wide checkpoint dir, as that is a context-level knob.
  */
object Checkpoints {
  def truncate(spark: SparkSession, df: DataFrame): DataFrame =
    spark.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(true)
      case None => df.localCheckpoint(true)
    }
}
