package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DECLARATIVE streaming sessionization via the built-in `session_window`
  * gap aggregation — the second of Spark's two session mechanisms, beside
  * [[StreamingSessionize]]'s `flatMapGroupsWithState`:
  *
  *  - `flatMapGroupsWithState` runs USER code in the state path — maximal
  *    flexibility (emit-on-prove, custom payloads), but the state layout
  *    is opaque to the engine.
  *  - `session_window` is a native merging-window AGGREGATION: the state
  *    store understands the windows, merges them itself, and the whole
  *    pipeline stays declarative — the shape that gets RocksDB state
  *    backends and state-store compaction for free, which is what you run
  *    against an unbounded feed at scale.
  *
  * Both are driven by the same staging (single-file corpus + far-future
  * sentinel, [[StreamingSessionize.stageWithSentinel]]) and checked
  * against the SAME batch oracle, pinning that the two mechanisms agree.
  * One semantic note: `session_window` starts a new session at gap ≥ 30
  * min where the state-function (and the oracle's `> 1800000`) splits at
  * gap > 30 min — distinguishable only by an exactly-on-the-millisecond
  * boundary event, absent from real timestamp data (asserted absent from
  * the testdata at every SF).
  */
object StreamingSessionWindow {

  import StreamingSessionize.GapMs

  private val drainScratch = new graft.util.ScratchSlot

  /** The declarative session lifecycle as a bounded, oracle-checkable
    * drain. Append mode flushes a session when the watermark passes its
    * window END (last event + gap) — the sentinel pushes the final
    * watermark past every real session's end; the sentinel's own session
    * stays in state forever-pending and is filtered out. The built-in
    * window's `end` is last-event + gap by construction, so
    * `unix_millis(end) − gap` recovers the oracle's last-event
    * `session_end_ms` exactly (the 30-minute gap is a whole number of
    * millis).
    */
  def sessionsAvailableNow(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    drainScratch.retire()
    val watch = StreamingSessionize.stageWithSentinel(spark, sfDir)
    val ss = StreamingIndexer.drainSession(spark)
    val drained = StreamingIndexer.drainToBlocks(
      ss.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(watch.toString + "/*")
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events")),
      "append", drainScratch)
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start_ms"))
    drained
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        (unix_millis(col("session_window.end")) - GapMs).as("session_end_ms"),
        col("n_events"))
      .withColumn("session_no", row_number().over(w).cast("long"))
      .withColumn("duration_s",
        ((col("session_end_ms") - col("session_start_ms")) / 1000).cast("long"))
      .select("user_id", "session_no", "session_start_ms", "session_end_ms",
        "n_events", "duration_s")
      .orderBy("user_id", "session_no")
  }
}
