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

  private val outerScratch = new graft.util.ScratchSlot
  private val outerSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LEFT OUTER stream-stream join — the semantically harder sibling of
    * [[purchaseViewsAvailableNow]]: a view-less purchase emits its
    * null-padded row only when the WATERMARK proves no matching view can
    * still arrive (outer emission is watermark-driven, unlike inner).
    * A bounded drain therefore needs the final watermark pushed past
    * every purchase, or trailing outer rows stay buffered forever — the
    * same far-future-sentinel flush as the streaming sessionizer, staged
    * as a second file whose mtime puts it in a LATER micro-batch. The
    * null-count rollup then happens entirely on the STREAM'S OUTPUT (a
    * view-less purchase is visible as its null-view row, not
    * reconstructed by a batch tail), and the batch interval-join oracle
    * checks the result bit-for-bit.
    */
  def purchaseViewsOuterAvailableNow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    outerScratch.retire()
    val watch = java.nio.file.Files.createTempDirectory("graft_stream_ssouter_")
    // stage the REAL events (original ns parquet, read raw below) and a
    // sentinel file carrying one far-future row PER ROLE
    java.nio.file.Files.copy(java.nio.file.Paths.get(sfDir, "events.parquet"),
      watch.resolve("a_events"), java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val maxNs = Tables.events(spark, sfDir)
      .agg(max(unix_millis(col("ts"))).as("m")).head().getLong(0)
    val sentinelMs = maxNs + (4L * 3600 * 1000) // 2h watermark + 1h bound + 1h margin
    Seq((-1L, sentinelMs * 1000000L, -1L, "view", 0.0, ""),
        (-2L, sentinelMs * 1000000L, -2L, "purchase", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(watch.resolve("z_sentinel").toString)
    val now = System.currentTimeMillis()
    Option(watch.resolve("z_sentinel").toFile.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .foreach(f => { f.setLastModified(now + 60_000); () })

    val table = s"graft_stream_ssouter_${outerSeq.incrementAndGet()}"
    val partKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    try {
      val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING"
      val src = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(watch.toString + "/*")
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
            col("v_ts") <= col("p_ts"),
          "left_outer")
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(table)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally spark.conf.set(partKey, prevParts)
    outerScratch.defer(
      () => { spark.catalog.dropTempView(table); () },
      () => graft.util.Scratch.deleteRecursively(watch))
    spark.table(table)
      .filter(col("p_user") >= 0) // drop the sentinel's own rows
      .groupBy(col("event_id"), col("p_user").as("user_id"),
        unix_millis(col("p_ts")).as("purchase_ms"))
      .agg(sum(when(col("v_user").isNotNull, 1L).otherwise(0L)).as("n_views_1h"))
      .orderBy("event_id")
  }
}
