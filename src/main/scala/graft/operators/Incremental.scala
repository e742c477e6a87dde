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

  private val scd2Scratch = new graft.util.ScratchSlot

  /** Incremental SCD TYPE-2 MAINTENANCE — the CDC shape every lakehouse
    * dimension pipeline runs: a STORED SCD2 table plus an append-only
    * event delta, merged by STATE, never by re-reading base events. The
    * only stored state a user's history needs is its OPEN version (the
    * is_current row); the delta's own runs chain onto it:
    *
    *  - delta runs are built by the same gaps-and-islands plan
    *    ([[Events.scd2Of]]) over the DELTA ONLY;
    *  - if a user's first delta run continues the open version's
    *    attribute, the open row absorbs it (n_events add, validity
    *    extends; the run is dropped and later runs shift down one
    *    version) — otherwise the open row closes at the delta's first
    *    timestamp and the runs append behind it;
    *  - stored CLOSED rows and untouched users are carried verbatim;
    *    users new in the delta keep their standalone runs.
    *
    * Correct because the split is by TIME: every delta event follows
    * every base event per user, so the only seam is the open-version
    * boundary. Cost = stored table + delta events (at 100 TB: the new
    * partition + an is_current-indexed dimension scan); the monolithic
    * rebuild lives only in the oracle — the hash match proves the merge
    * algebra exact, versions, flags, intervals and all.
    */
  def scd2Incremental(spark: SparkSession, sfDir: String,
                      splitAt: String = "2024-01-24 00:00:00"): DataFrame = {
    scd2Scratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_scd2_")
    scd2Scratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val split = lit(splitAt).cast("timestamp")
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"), col("ts"))

    val basePath = dir.resolve("scd2_state").toString
    Events.scd2Of(ev.filter(col("ts") < split).drop("ts"))
      .write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)

    val deltaRuns = Events.scd2Of(ev.filter(col("ts") >= split).drop("ts"))
    scd2Merge(base, deltaRuns)
  }

  /** The pure state-merge of [[scd2Incremental]]: stored SCD2 rows +
    * delta-only runs → merged SCD2 rows. Split out so specs can drive
    * the seam cases (absorb, close, single-run absorb, new user,
    * untouched user) directly.
    */
  private[graft] def scd2Merge(base: DataFrame,
                               deltaRuns: DataFrame): DataFrame = {
    val open = base.filter(col("is_current") === 1L)
      .select(col("user_id"), col("version").as("o_version"),
        col("event_type").as("o_type"), col("valid_from_ms").as("o_from"),
        col("n_events").as("o_n"))
    val d1 = deltaRuns.filter(col("version") === 1L)
      .select(col("user_id"), col("event_type").as("d1_type"),
        col("valid_from_ms").as("d1_from"), col("valid_to_ms").as("d1_to"),
        col("n_events").as("d1_n"))
    // per touched user: does the delta continue the open attribute?
    val dec = d1.join(open, Seq("user_id"), "left")
      .withColumn("cont",
        col("o_type").isNotNull && (col("o_type") === col("d1_type")))

    val touched = d1.select("user_id")
    val untouched = base.join(touched, Seq("user_id"), "left_anti")
    val closedStored = base.filter(col("is_current") === 0L)
      .join(touched, Seq("user_id"), "left_semi")
    // the adjusted open row: absorbs or closes
    val openAdj = dec.filter(col("o_type").isNotNull)
      .select(col("user_id"), col("o_version").as("version"),
        col("o_type").as("event_type"),
        col("o_from").as("valid_from_ms"),
        when(col("cont"), col("d1_to")).otherwise(col("d1_from"))
          .as("valid_to_ms"),
        when(col("cont"), col("o_n") + col("d1_n")).otherwise(col("o_n"))
          .as("n_events"),
        when(col("cont") && col("d1_to").isNull, 1L).otherwise(0L)
          .as("is_current"))
    // delta runs shifted behind the stored history (run 1 dropped when
    // absorbed); new-in-delta users keep their standalone numbering
    val shifted = deltaRuns
      .join(dec.select(col("user_id"), col("cont"), col("o_version")),
        Seq("user_id"), "left")
      .withColumn("absorb", coalesce(col("cont"), lit(false)))
      .filter(!(col("absorb") && col("version") === 1L))
      .select(col("user_id"),
        (col("version") + coalesce(col("o_version"), lit(0L))
          - when(col("absorb"), 1L).otherwise(0L)).as("version"),
        col("event_type"), col("valid_from_ms"), col("valid_to_ms"),
        col("n_events"), col("is_current"))

    untouched.unionByName(closedStored).unionByName(openAdj)
      .unionByName(shifted)
      .orderBy("user_id", "version")
  }
}
