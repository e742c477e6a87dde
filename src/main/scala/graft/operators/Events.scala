package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time analytics over the `events` table (SURVEY.md §2.2): tumbling
  * windows, sessionization, and share-of-total rates — the batch forms of
  * the operators `graft.streaming` runs incrementally.
  *
  * Timestamp contract: the parquet column is nanosecond-precision; Spark
  * truncates to µs, DuckDB keeps ns. Outputs therefore never expose a raw
  * timestamp — hours go out as strings, instants as epoch milliseconds
  * (both engines floor identically).
  */
object Events {

  /** Tumbling 1-hour window per event type: counts + exact decimal sums. */
  def hourlyRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour", "event_type")

  /** Sessionization: a session breaks after a 30-minute inactivity gap.
    * lag → gap flag → running sum = session number (one shuffle on
    * user_id; the standard sessionize-without-UDF shape).
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    // order by the SAME key the oracle uses (epoch ms, event_id) — raw ts
    // is µs here vs ns in DuckDB, so sub-ms ordering could diverge
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    Tables.events(spark, sfDir)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ms")).as("session_start_ms"),
        max(col("ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        ((max(col("ms")) - min(col("ms"))) / 1000).cast("long").as("duration_s"))
      .orderBy("user_id", "session_no")
  }

  /** Per-type share of total events + distinct-user reach. */
  def typeShares(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(), 6))
      .select("event_type", "n", "n_users", "share")
      .orderBy("event_type")

  /** Top-5 most active users by event count, with their span of activity. */
  def topUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(unix_millis(col("ts"))).as("first_ms"),
        max(unix_millis(col("ts"))).as("last_ms"))
      .orderBy(desc("n_events"), col("user_id"))
      .limit(5)
}
