package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.sources.Tables

/** CUSTOM OPERATOR INSIDE A STREAMING PIPELINE — the `foreachBatch`
  * pattern: Structured Streaming's incremental planner can't plan a
  * custom physical operator, but every micro-batch IS a batch
  * DataFrame, so the batch planner (with the injected as-of strategy)
  * runs inside the sink. Each micro-batch of the event feed is enriched
  * through [[graft.plans.BroadcastAsOfJoinExec]] against the hourly
  * rate-card dimension built ONCE outside the stream — per batch the
  * probe side moves nothing, the dim rides the (reused) broadcast.
  * Because the enrichment is row-local given the dim, it composes over
  * ANY batching: the union of enriched micro-batches equals the batch
  * answer, which is exactly what the shared DuckDB oracle checks.
  *
  * At scale this is the standard shape for "stream joined to a slowly
  * changing dimension snapshot": foreachBatch + broadcast, with the dim
  * refreshed between batches if needed (here it is immutable, so the
  * exchange reuse is total).
  */
object StreamingAsOf {

  private val scratch = new graft.util.ScratchSlot

  /** Spec observability: micro-batches the last drain ran, and whether
    * every one of them planned the broadcast as-of exec in its sink.
    */
  private[graft] val lastNumBatches =
    new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private[graft] var lastAllBatchesUsedBroadcastExec = false

  /** Drain the event feed (staged as two files → two micro-batches via
    * maxFilesPerTrigger=1) through the per-batch broadcast as-of
    * enrichment into a parquet sink, and return the union — shaped
    * exactly like the batch [[Events.prevHourRate]] so the SAME oracle
    * SQL verifies the streamed composition.
    */
  def enrichAvailableNow(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.Files
    scratch.retire()
    val watch = Files.createTempDirectory("graft_stream_asof_in_")
    val outDir = Files.createTempDirectory("graft_stream_asof_out_")
    // stage through Tables.events so the staged ts is plain µs
    // TimestampType whatever the driver's physical encoding was; two
    // files so the AvailableNow drain genuinely runs two micro-batches
    Tables.events(spark, sfDir).repartition(2)
      .write.mode("overwrite").parquet(watch.toString)
    val ss = StreamingIndexer.drainSession(spark)
    val schema = ss.read.parquet(watch.toString).schema
    // the dimension: built once on the outer (batch) plan, probed by
    // every micro-batch — the slowly-changing-dimension snapshot shape
    val hourly = Events.hourlyCells(Tables.events(ss, sfDir))
    lastNumBatches.set(0)
    lastAllBatchesUsedBroadcastExec = true
    val writeBatch: (Dataset[Row], Long) => Unit = { (batch, _) =>
      val enriched = Events.enrichWithPrevHour(
        batch.select(col("event_id"), col("event_type"),
          expr("unix_millis(ts)").as("ms")),
        hourly)
      lastNumBatches.incrementAndGet()
      // sparkPlan (pre-adaptive): the exec node is visible before AQE
      // wraps stages; executedPlan would hide it behind the AQE leaf
      if (enriched.queryExecution.sparkPlan.collect {
            case b: graft.plans.BroadcastAsOfJoinExec => b }.isEmpty)
        lastAllBatchesUsedBroadcastExec = false
      enriched.write.mode("append").parquet(outDir.toString)
    }
    ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
      .writeStream
      .foreachBatch(writeBatch)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()
    scratch.defer(
      () => graft.util.Scratch.deleteRecursively(watch),
      () => graft.util.Scratch.deleteRecursively(outDir))
    spark.read.parquet(outDir.toString).orderBy("event_id")
  }
}
