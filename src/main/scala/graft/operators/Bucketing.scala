package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed (pre-partitioned) tables: the co-located-join strategy for
  * joins too big to broadcast.
  *
  * At 100 TB the orders⋈lineitem join is the canonical shuffle bottleneck:
  * both sides re-hash every run. Writing both tables bucketed BY THE JOIN
  * KEY into the same bucket count moves that shuffle to WRITE TIME, once;
  * every subsequent join (and any aggregation keyed on the same column)
  * reads co-located buckets and runs with ZERO exchanges — the
  * sort-merge join consumes each bucket pair directly. This is the Spark
  * analogue of the reference's letter-partitioned index files
  * (`/root/reference/helper_reduce.c:238-242`): pay the partitioning once
  * at materialization, serve unlimited queries off it.
  *
  * Tables register in the session catalog (bucket metadata lives there);
  * [[ensureBucketed]] is idempotent per session and keyed by corpus dir.
  */
object Bucketing {

  val NumBuckets = 8

  private def tblName(prefix: String, sfDir: String): String =
    prefix + "_" + graft.util.Scratch.valueToken(sfDir)

  /** Materialize orders + lineitem bucketed and bucket-sorted by order
    * key. Returns the two table names.
    */
  def ensureBucketed(spark: SparkSession, sfDir: String): (String, String) = {
    val ot = tblName("graft_orders_b", sfDir)
    val lt = tblName("graft_lineitem_b", sfDir)
    // table data lands under the configurable scratch root (shared
    // storage on a cluster — executors must read each other's buckets)
    // Pre-shuffle each table by its bucket column before the bucketed
    // write: Spark's bucketed writer does NOT shuffle — each input task
    // splits its rows across all N bucket files and sorts every slice, so
    // a one-task scan (the bench corpus is a single-row-group file) means
    // ONE task builds and sorts all buckets serially, and a many-task
    // input writes N files per task. repartition on the bucket column
    // uses the same hash the bucket spec does, so each task holds exactly
    // one bucket: parallel build, one file per bucket at any input
    // parallelism (guide §2.4 "two operations keyed the same way share
    // one exchange" — here the exchange IS the bucket layout).
    if (!spark.catalog.tableExists(ot)) {
      Tables.orders(spark, sfDir)
        .repartition(NumBuckets, col("o_orderkey")).write
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", graft.util.Scratch.dir(spark, ot))
        .mode("overwrite").format("parquet").saveAsTable(ot)
    }
    if (!spark.catalog.tableExists(lt)) {
      Tables.lineitem(spark, sfDir)
        .repartition(NumBuckets, col("l_orderkey")).write
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", graft.util.Scratch.dir(spark, lt))
        .mode("overwrite").format("parquet").saveAsTable(lt)
    }
    (ot, lt)
  }

  /** Per-order revenue through the bucketed join. Join AND the follow-on
    * aggregation both key on the bucket column, so the whole pipeline up
    * to the final presentation sort is exchange-free (asserted in
    * BucketingSpec). Decimal-exact revenue, cast to double at the edge.
    */
  def bucketedOrderRevenue(spark: SparkSession, sfDir: String): DataFrame =
    orderRevenueUnordered(spark, sfDir).orderBy("o_orderkey")

  /** The exchange-free core (no presentation sort) — what a downstream
    * consumer that doesn't need global order would run.
    */
  private[graft] def orderRevenueUnordered(spark: SparkSession,
                                           sfDir: String): DataFrame = {
    val (ot, lt) = ensureBucketed(spark, sfDir)
    spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("rev"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("rev").cast("double").as("revenue"))
  }
}
