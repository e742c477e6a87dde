package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** STREAM-STREAM join — the last Structured Streaming shape in the
  * surface: two watermarked event streams (views and purchases filtered
  * from the same feed) inner-joined on user with an event-time range
  * condition. The watermarks plus the time bound let Spark DROP join
  * state once a side's events can no longer match — without them a
  * stream-stream join buffers both streams forever, which is the whole
  * scale question at 100 TB/day.
  */
object StreamingJoin {

  private val ssScratch = new graft.util.ScratchSlot

  /** Views-before-purchase as a BOUNDED, oracle-checked stream-stream
    * join: each (purchase, view-within-preceding-hour) pair is emitted
    * exactly once by the append-mode inner join (inner-join emission does
    * not wait for the watermark; the watermark only bounds state), the
    * AvailableNow drain collects the pairs, and a batch tail rolls them
    * up per purchase and zero-fills view-less purchases. Output equals
    * the batch interval join [[graft.operators.Events.viewsBeforePurchase]]
    * bit-for-bit, so the SAME oracle SQL verifies it.
    */
  def purchaseViewsAvailableNow(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val pairs = StreamingIndexer.drainToTable(spark, sfDir, "events.parquet",
      "stream_ssjoin", ssScratch, mode = "append") { watch =>
        // floor the ns event time to MILLISECONDS before watermarking:
        // the batch oracle compares epoch-ms, and a view landing in the
        // same ms as the purchase but a later µs must still join
        val src = spark.readStream
          .schema(schema)
          .parquet(watch)
          .withColumn("ts", expr("timestamp_millis(ts div 1000000)"))
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
          .withWatermark("v_ts", "2 hours")
        val purchases = src.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"))
          .withWatermark("p_ts", "2 hours")
        purchases.join(views,
          col("p_user") === col("v_user") &&
            col("v_ts") > col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("v_ts") <= col("p_ts"))
          .select(col("event_id"))
      }
    val counts = pairs.groupBy("event_id").agg(count(lit(1)).as("n_views"))
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("purchase_ms"))
      .join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("purchase_ms"),
        coalesce(col("n_views"), lit(0L)).as("n_views_1h"))
      .orderBy("event_id")
  }
}
