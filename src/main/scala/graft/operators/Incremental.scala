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
  def incrementalRollup(spark: SparkSession, sfDir: String,
                        splitAt: String = "2024-01-24 00:00:00"): DataFrame = {
    scratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_rollup_")
    scratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val split = lit(splitAt).cast("timestamp")
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

  private val joinScratch = new graft.util.ScratchSlot

  /** Incremental maintenance of a JOIN view — the textbook two-sided delta
    * formula. The view is a (status, ship-year) revenue rollup over
    * orders ⋈ lineitem; both base tables grow (orders split by order date,
    * lineitem by ship date), and the refresh computes
    *
    *   Δview = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB
    *
    * aggregated and merged into the MATERIALIZED partial state of
    * V₀ = agg(A₀⋈B₀) — never re-joining the old data with itself. At
    * 100 TB that third term is the point: the two big-small joins stream
    * the deltas against the base sides, and old⋈old — the overwhelming
    * bulk of the work — is never recomputed. The oracle joins the full
    * tables from scratch; the hash match proves the algebra is exact
    * (counts long, revenue DECIMAL through every level).
    */
  def incrementalJoinView(spark: SparkSession, sfDir: String,
                          splitAt: String = "1998-01-01"): DataFrame = {
    joinScratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_join_")
    joinScratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val split = lit(splitAt).cast("timestamp")
    val rev = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    def partial(orders: DataFrame, lineitem: DataFrame): DataFrame =
      lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"), year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("n"), sum(rev).as("revenue_dec"))

    val oOld = Tables.orders(spark, sfDir).filter(col("o_orderdate") < split)
    val oNew = Tables.orders(spark, sfDir).filter(col("o_orderdate") >= split)
    val lOld = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") < split)
    val lNew = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") >= split)

    val basePath = dir.resolve("view_state").toString
    partial(oOld, lOld).write.mode("overwrite").parquet(basePath)

    spark.read.parquet(basePath)
      .unionByName(partial(oNew, lOld))
      .unionByName(partial(oOld, lNew))
      .unionByName(partial(oNew, lNew))
      .groupBy(col("o_orderstatus"), col("ship_year"))
      .agg(sum(col("n")).as("n"), sum(col("revenue_dec")).as("revenue_dec"))
      .select(col("o_orderstatus"), col("ship_year"), col("n"),
        col("revenue_dec").cast("double").as("revenue"))
      .orderBy("o_orderstatus", "ship_year")
  }

  private val kmvScratch = new graft.util.ScratchSlot

  /** The countDistinct leg [[incrementalRollup]] excludes, done honestly:
    * a KMV (k-minimum-values) sketch is MERGEABLE, and merging the k-min
    * sets of two data halves yields exactly the global k-min set (any of
    * the k globally smallest hashes is among its own half's k smallest).
    * The old half's sketch is materialized, the new half's is computed
    * live, and the merged estimate is provably identical to a sketch of
    * the full data — which is what the DuckDB oracle computes directly.
    * At 100 TB the refresh touches k rows of stored state plus the new
    * partition; the full-data scan lives only in the oracle.
    */
  def incrementalDistinctSketch(spark: SparkSession, sfDir: String,
                                k: Int = 64,
                                splitAt: String = "2024-01-24 00:00:00"): DataFrame = {
    kmvScratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_kmv_")
    kmvScratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val split = lit(splitAt).cast("timestamp")
    val Mod = 4294967291L // largest prime < 2^32
    def kmin(df: DataFrame): DataFrame =
      df.select(graft.functions.HashFunctions.knuthMod(col("user_id"), Mod).as("h"))
        .distinct().orderBy("h").limit(k)

    val basePath = dir.resolve("kmv_state").toString
    kmin(Tables.events(spark, sfDir).filter(col("ts") < split))
      .write.mode("overwrite").parquet(basePath)

    val merged = spark.read.parquet(basePath)
      .unionByName(kmin(Tables.events(spark, sfDir).filter(col("ts") >= split)))
      .distinct().orderBy("h").limit(k)
    val allHashes = Tables.events(spark, sfDir)
      .select(graft.functions.HashFunctions.knuthMod(col("user_id"), Mod).as("h")).distinct()
    merged.agg(count(lit(1)).as("k"), max(col("h")).as("kth_min"))
      .crossJoin(allHashes.agg(count(lit(1)).as("n_exact")))
      .select(col("k"), col("kth_min"),
        floor(((col("k") - 1) * lit(Mod.toDouble)) / col("kth_min") + 0.5)
          .cast("long").as("estimate"),
        col("n_exact"))
  }
}
