package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scan-level pushdowns beyond filters and flat-column pruning — the two
  * that decide whether a 100 TB scan reads terabytes or kilobytes:
  *
  *  - AGGREGATE pushdown: a global MIN/MAX/COUNT needs no row at all —
  *    parquet footers already carry per-row-group stats, and the V2
  *    parquet source answers the whole query from metadata
  *    (`PushedAggregation` in the scan node). The difference between a
  *    full-table pass and reading a few KB of footers.
  *  - NESTED schema pruning: production schemas bury payloads in structs;
  *    selecting one leaf of a 40-field struct must read ONE column
  *    chunk, not materialize the struct (`ReadSchema` shows the pruned
  *    leaf only).
  *
  * Both are plan-asserted in ScanPushdownSpec and value-checked by the
  * oracle.
  */
object ScanPushdown {

  /** Table-level min/max/count of lineitem quantity answered from parquet
    * FOOTER STATS: `spark.sql.parquet.aggregatePushdown` plus the V2 read
    * path turn the whole aggregation into a metadata read — zero data
    * pages touched. Both confs are pinned only for the duration of
    * planning (`executedPlan` forced inside the window, confs restored —
    * same discipline as [[Relational.runtimeFilteredBrandQty]]), because
    * the V1-source default must not leak into other queries' planning.
    */
  def footerStatsProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val pinned = Seq(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      // aggregate pushdown exists only on the DSv2 parquet path
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = Tables.lineitem(spark, sfDir)
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("n_rows"))
      df.queryExecution.executedPlan // force planning under the pinned confs
      df
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val scratch = new graft.util.ScratchSlot

  /** Stage events as a NESTED layout (metadata struct + payload struct —
    * the shape real event pipelines ship) and roll up by ONE leaf of the
    * payload struct. Nested schema pruning must narrow the scan to that
    * single leaf (`ReadSchema: struct<payload:struct<event_type:string>>`,
    * asserted in the spec) — without it the scan rematerializes both
    * structs to serve a one-column aggregation. Scratch handling as in
    * [[Formats.orcRoundTrip]]: one generation per call site.
    */
  def nestedPayloadRollup(spark: SparkSession, sfDir: String): DataFrame = {
    scratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_nested_ev_")
    scratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val target = dir.resolve("events_nested").toString
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        struct(col("ts"), col("user_id")).as("meta"),
        struct(col("event_type"), col("value"), col("props")).as("payload"))
      .write.mode("overwrite").parquet(target)
    nestedRollupFrom(spark, target)
  }

  /** The rollup over an already-staged nested layout (split out so the
    * spec can assert the pruned ReadSchema on the exact frame it runs).
    */
  private[graft] def nestedRollupFrom(spark: SparkSession,
                                      target: String): DataFrame =
    spark.read.parquet(target)
      .groupBy(col("payload.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
}
