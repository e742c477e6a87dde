package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Incremental view maintenance — refresh materialized aggregates from a
  * delta batch by MERGING PARTIAL STATES instead of recomputing from raw
  * data. At 100 TB this is the difference between touching the new day's
  * partition and re-scanning the table: a count/sum rollup's state is
  * mergeable (sum of sums, sum of counts), so `new = merge(old, agg(Δ))`
  * is exact, and the oracle proves it by recomputing the view from
  * scratch — a hash match means incremental ≡ full, bit-for-bit.
  *
  * Only ALGEBRAIC aggregates qualify (count, sum, min, max, and anything
  * built from them); countDistinct does not — its honest incremental form
  * is a mergeable sketch (see [[IndexQueries.vocabApprox]]'s HLL and the
  * KMV variant), which is why this view drops the rollup's n_users column
  * rather than pretending partial distinct counts add.
  */
object Incremental {

  private val scratch = new graft.util.ScratchSlot

  /** The hourly rollup split into a MATERIALIZED base (events before the
    * split, written to parquet and read back — the merge must work off
    * stored state, not lineage) plus a delta aggregation of the tail,
    * merged by re-aggregating the partial states on the same keys. Counts
    * stay long, values stay exact DECIMAL through both levels, so the
    * merged view hash-matches a from-scratch recompute.
    */
  def incrementalRollup(spark: SparkSession, sfDir: String): DataFrame = {
    scratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_rollup_")
    scratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val split = lit("2024-01-24 00:00:00").cast("timestamp")
    def partial(df: DataFrame): DataFrame =
      df.groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(14,2)")).as("total_value_dec"))

    val basePath = dir.resolve("base_state").toString
    partial(Tables.events(spark, sfDir).filter(col("ts") < split))
      .write.mode("overwrite").parquet(basePath)

    val delta = partial(Tables.events(spark, sfDir).filter(col("ts") >= split))
    spark.read.parquet(basePath)
      .unionByName(delta)
      .groupBy(col("hour_ts"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        sum(col("total_value_dec")).as("total_value_dec"))
      .select(
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        col("n"),
        col("total_value_dec").cast("double").as("total_value"))
      .orderBy("hour", "event_type")
  }
}
