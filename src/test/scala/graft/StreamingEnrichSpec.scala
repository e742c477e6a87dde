package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIndexer

/** Stream-static enrichment: the per-micro-batch broadcast dim join's
  * drained aggregation state must equal the one-shot batch join+rollup.
  */
class StreamingEnrichSpec extends SparkTestBase {
  import spark.implicits._

  test("AvailableNow drain equals the batch join+rollup") {
    val streamed = StreamingIndexer.enrichedSegmentRollup(spark, sf)
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = graft.sources.Tables.events(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
      .orderBy("segment", "event_type")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // every segment of the dimension that has events appears enriched
    assert(streamed.map(_._1).distinct.size > 1)
  }

  test("foreachBatch as-of enrichment: micro-batch union ≡ batch, custom exec per batch") {
    val streamed = graft.streaming.StreamingAsOf
      .enrichAvailableNow(spark, sf)
      .as[(Long, String, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted
    val batch = graft.operators.Events.prevHourRate(spark, sf)
      .as[(Long, String, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the drain genuinely ran multiple micro-batches, and EVERY batch's
    // sink plan used the broadcast as-of exec (not a fallback join)
    assert(graft.streaming.StreamingAsOf.lastNumBatches.get >= 2,
      "expected the two staged files to drain as >= 2 micro-batches")
    assert(graft.streaming.StreamingAsOf.lastAllBatchesUsedBroadcastExec,
      "a micro-batch sink planned without BroadcastAsOfJoinExec")
  }
}
