package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (inclusive scan) — the scale-safe form of
  * `sum(x).over(Window.orderBy(k))`, which funnels the ENTIRE dataset
  * through one partition (Spark's empty-partition global window).
  *
  * Classic two-phase scan instead:
  *   1. range-partition by the order key, local cumsum per partition
  *      (per-partition window — parallel, no funnel);
  *   2. per-partition totals (numPartitions rows) get their own tiny
  *      cumulative offsets and are broadcast back.
  * The only global window runs over ≤ numPartitions rows — bounded by
  * cluster configuration, not by data size.
  */
object Scan {

  /** Adds `outCol` = inclusive prefix sum of `valueCol` in `orderCol`
    * order. `orderCol` must be unique (it is the total order).
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String): DataFrame =
    prefixSumBy(df, Seq(col(orderCol)), valueCol, outCol)

  /** Composite-key variant: the order keys together must form a total
    * order (e.g. a non-unique score disambiguated by id). When `totalCol`
    * is set, every row also carries the GRAND total of `valueCol` — it
    * falls out of the same ≤ numPartitions-row offsets pass for free, so
    * a consumer needing rank AND total (ntile-style bucketing) reads the
    * input exactly once instead of re-running the upstream plan for a
    * count.
    */
  def prefixSumBy(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                  outCol: String, totalCol: Option[String] = None): DataFrame = {
    val byRange = df.repartitionByRange(orderCols: _*)
      .withColumn("_pid", spark_partition_id())
    val local = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = byRange.withColumn("_local_cum",
      sum(col(valueCol)).over(local))
    // offsets: cumulative sum of the PRIOR partitions' totals — a global
    // window, but over numPartitions rows only
    val offsetsBase = withLocal.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_part_sum"))
      .withColumn("_offset",
        coalesce(
          sum(col("_part_sum")).over(Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val offsets = totalCol.fold(offsetsBase) { t =>
      offsetsBase.withColumn(t,
        sum(col("_part_sum")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    }.select(col("_pid") +: col("_offset") +: totalCol.map(col).toSeq: _*)
    withLocal.join(broadcast(offsets), "_pid")
      .withColumn(outCol, col("_local_cum") + col("_offset"))
      // _offset must not leak: a second scan over this output would see
      // two _offset columns and fail resolution (vocabCoverage chains two)
      .drop("_pid", "_local_cum", "_offset")
  }
}
