package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Incremental
import graft.sources.Tables

/** IVM edge cases the driver's mid-range split never exercises: an EMPTY
  * materialized base (first refresh ever — every row is delta) and an
  * empty delta (refresh with nothing new). Both must still equal the
  * from-scratch recompute; the empty-base case in particular depends on
  * Spark writing a schema-bearing parquet file for an empty DataFrame,
  * which is exactly the state a brand-new view starts from.
  */
class IncrementalSpec extends SparkTestBase {

  private def fullRollup: DataFrame =
    Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
      .orderBy("hour", "event_type")

  // each operator call retires the PREVIOUS call's scratch (the ScratchSlot
  // one-generation contract), so every result is collected eagerly before
  // the next invocation
  private def rows(df: DataFrame) = df.collect().toSeq

  test("rollup merge with an EMPTY BASE equals the full recompute") {
    assert(rows(Incremental.incrementalRollup(spark, sf, "2000-01-01 00:00:00"))
      == rows(fullRollup))
  }

  test("rollup merge with an EMPTY DELTA equals the full recompute") {
    assert(rows(Incremental.incrementalRollup(spark, sf, "2030-01-01 00:00:00"))
      == rows(fullRollup))
  }

  test("join-view maintenance is split-invariant (all-old ≡ all-new ≡ mid)") {
    val allNew = rows(Incremental.incrementalJoinView(spark, sf, "1990-01-01"))
    val allOld = rows(Incremental.incrementalJoinView(spark, sf, "2030-01-01"))
    val mid = rows(Incremental.incrementalJoinView(spark, sf, "1998-01-01"))
    assert(allNew == mid)
    assert(allOld == mid)
  }

  test("KMV merge is split-invariant, including an empty-side sketch") {
    val mid = rows(Incremental.incrementalDistinctSketch(spark, sf))
    val allNew = rows(Incremental.incrementalDistinctSketch(spark, sf,
      splitAt = "2000-01-01 00:00:00"))
    assert(allNew == mid)
  }
}
