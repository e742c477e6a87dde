package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.streaming.StreamingMv

/** The streaming-maintained hourly view must be bit-identical to the
  * batch build (exact cell merges), the drain must span both query
  * incarnations (resume proven), and the serve query must be answered
  * FROM the streaming state via the optimizer rewrite.
  */
class StreamingMvSpec extends SparkTestBase {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  test("maintained state == batch view, served through the rewrite") {
    val df = StreamingMv.mvServeAvailableNow(spark, sf)
    val statePath = graft.util.Scratch.dir(spark,
      "graft_mv_stream_" + graft.util.Scratch.valueToken(sf))

    // ≥2 batches across 2 incarnations: the checkpoint resume is real
    assert(StreamingMv.lastNumBatches.get() >= 2)

    // the serve plan reads the streaming state, not base events
    val paths = scanPaths(df)
    assert(paths.exists(_.contains(statePath)), s"no state scan in $paths")
    assert(!paths.exists(_.contains("events.parquet")),
      s"base scan survived the rewrite: $paths")

    // state ≡ a from-scratch batch build, bit for bit (both directions)
    val batch = spark.read.parquet(
      graft.operators.RollupView.ensure(spark, sf))
    val stream = spark.read.parquet(statePath)
    assert(stream.count() === batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)

    assert(df.collect().nonEmpty)
  }

  test("checkpoint-resumed maintenance equals the one-incarnation state") {
    def rows(path: String) = spark.read.parquet(path)
      .orderBy("hour_ts", "event_type").collect().toSeq
    val fast = rows(StreamingMv.maintainedViewPath(spark, sf))
    assert(StreamingMv.lastNumBatches.get() >= 2)
    val resumed = rows(StreamingMv.maintainedViewPath(spark, sf,
      resumeProof = true))
    assert(StreamingMv.lastNumBatches.get() >= 2)
    assert(resumed == fast)
  }
}
