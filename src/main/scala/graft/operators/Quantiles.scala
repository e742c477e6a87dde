package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BottomKSketchAgg, HashFunctions}
import graft.sources.Tables

/** Sketch-based quantile estimation and range-partition planning — the
  * two jobs a 100 TB engine does with a SAMPLE, never the data:
  *
  *  - "what is p99 latency per event type?" must not shuffle every row
  *    to its group (exact `percentile` does exactly that, and
  *    `q_value_percentiles` keeps that exact path for comparison);
  *  - "where do I cut 32 range partitions for a global sort?" is what
  *    Spark's own `RangePartitioner` answers by sampling — here the
  *    boundary table is a first-class, oracle-checked relation a
  *    pipeline can persist and reuse across runs (stable shard
  *    boundaries across daily builds, the way the reference's 26 letter
  *    files are a FIXED alphabetic range partitioning,
  *    `/root/reference/helper_map.c:343-364`).
  *
  * Both ride [[graft.functions.BottomKSketchAgg]]: the k smallest
  * distinct (knuth-hash, value) pairs — a uniform fixed-size sample
  * that merges map-side (each task forwards ≤ k pairs per group, the
  * input-vs-k reduction), is layout-invariant, and — because the hash
  * is the engine-exact multiplicative hash the sampling operators
  * already share — reproduces bit-for-bit in the DuckDB oracle, unlike
  * `percentile_approx`, whose compaction is arrival-order-dependent.
  *
  * The quantile rule is pure integer arithmetic so both engines index
  * the same sample slot: rank(p%) = (p · (n−1)) div 100 into the
  * value-ascending sample (floating `p·(n−1)` would tie-break
  * differently across engines when the product lands near an integer).
  */
object Quantiles {

  private val M32 = 4294967296L

  /** Per-event-type quantile estimates (p50/p90/p99) of `value` from a
    * k-sized bottom-k sample per group. One partial-aggregating shuffle
    * of ≤ k pairs per (task, group) — compare `q_value_percentiles`,
    * whose exact percentile must move every row.
    */
  def sketchQuantiles(spark: SparkSession, sfDir: String,
                      k: Int = 256): DataFrame = {
    val ev = Tables.events(spark, sfDir).where(col("value").isNotNull)
    val base = ev.select(col("event_type"),
      HashFunctions.knuthMod(col("event_id"), M32).as("h"),
      col("value").cast("double").as("v"))
    quantilesOfSketches(
      base.groupBy("event_type")
        .agg(BottomKSketchAgg.bottomkSketch(col("h"), col("v"), k).as("s")))
  }

  /** Quantile extraction over a (event_type, s: array<double>) sketch
    * relation — shared by the batch path and the streaming twin (whose
    * drained state is the same sketch, so the same extraction applies).
    */
  private[graft] def quantilesOfSketches(sketches: DataFrame): DataFrame =
    sketches.selectExpr(
        "event_type",
        "CAST(size(s) AS BIGINT) AS n_sample",
        "element_at(s, CAST((50 * (size(s) - 1)) DIV 100 AS INT) + 1) AS p50_est",
        "element_at(s, CAST((90 * (size(s) - 1)) DIV 100 AS INT) + 1) AS p90_est",
        "element_at(s, CAST((99 * (size(s) - 1)) DIV 100 AS INT) + 1) AS p99_est")
      .orderBy("event_type")

  /** Range-partition boundary plan over document length: the 31 cut
    * points that tile `n_chars` into `parts` ≈equal-row range buckets,
    * from one corpus-wide k-sample. This is the planning relation for
    * `repartitionByRange`-style global sorts and stable length-bucketed
    * sharding — computed in one pass, O(k) state, deterministic across
    * runs/layouts (Spark's internal RangePartitioner re-samples per run,
    * so its boundaries drift; a persisted boundary table doesn't).
    */
  def rangeBoundaries(spark: SparkSession, sfDir: String,
                      parts: Int = 32, k: Int = 512): DataFrame = {
    val docs = Tables.documents(spark, sfDir).where(col("n_chars").isNotNull)
    val base = docs.select(
      HashFunctions.knuthMod(col("doc_id"), M32).as("h"),
      col("n_chars").cast("double").as("v"))
    base
      .agg(BottomKSketchAgg.bottomkSketch(col("h"), col("v"), k).as("s"))
      .select(explode(sequence(lit(1), lit(parts - 1))).as("bucket"), col("s"))
      .selectExpr(
        "CAST(bucket AS BIGINT) AS bucket",
        s"element_at(s, CAST((bucket * (size(s) - 1)) DIV $parts AS INT) + 1) AS upper_bound")
      .orderBy("bucket")
  }

  /** Range-shard ASSIGNMENT — the consumer of [[rangeBoundaries]]: every
    * document gets the shard whose boundary window contains its length
    * (shard = number of cut points strictly below it), then the shard
    * census proves the plan balances. The physical shape is the one that
    * holds at 100 TB: the boundary table collapses to ONE row carrying a
    * 31-double array, broadcast to every task; assignment is a row-local
    * O(log parts)-equivalent array fold (no shuffle, no join blow-up —
    * the relational "join each row against all boundaries" form
    * multiplies the corpus by `parts` before aggregating). This is
    * `repartitionByRange` reified as data: same sample, same cuts, but
    * persistable and REPRODUCIBLE across runs/engines.
    */
  def rangeShards(spark: SparkSession, sfDir: String,
                  parts: Int = 32, k: Int = 512): DataFrame = {
    val bounds = rangeBoundaries(spark, sfDir, parts, k)
      .agg(sort_array(collect_list(col("upper_bound"))).as("bs"))
    val docs = Tables.documents(spark, sfDir).where(col("n_chars").isNotNull)
      .select(col("n_chars").cast("double").as("v"))
    docs.crossJoin(broadcast(bounds))
      .selectExpr("CAST(size(filter(bs, b -> b < v)) AS BIGINT) AS shard", "v")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("v").as("min_chars"), max("v").as("max_chars"))
      .orderBy("shard")
  }

  /** q_sketch_error: MEASURED accuracy of the sketch-quantile tier — the
    * recall@k discipline ([[Similarity.annRecall]]) applied to
    * quantiles. For each (event_type, p) estimate, the exact RANK window
    * the estimate occupies in the true per-type distribution
    * ([rank_lo, rank_hi] under duplicates) and its integer distance from
    * the target rank ⌊p·(n−1)/100⌋ — rank error, the ε a bottom-k sample
    * actually delivered, in the units sketch guarantees are stated in
    * (value error would be scale-dependent and float-fragile; rank error
    * is exact integers end to end).
    *
    * One corpus pass: the 3·|types| estimate rows broadcast into a
    * conditional aggregation — the exact-rank legs never sort or shuffle
    * the feed (an exact per-type percentile would); at 100 TB this is
    * the only affordable way to AUDIT a sketch in production.
    */
  def sketchErrorAudit(spark: SparkSession, sfDir: String,
                       k: Int = 256): DataFrame = {
    val est = sketchQuantiles(spark, sfDir, k).selectExpr("event_type",
      "stack(3, 50, p50_est, 90, p90_est, 99, p99_est) AS (p, est)")
    val ev = Tables.events(spark, sfDir).where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double").as("v"))
    ev.join(broadcast(est), "event_type")
      .groupBy(col("event_type"), col("p"), col("est"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("rank_lo"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("rank_hi1"))
      .select(col("event_type"), col("p"), col("n"), col("est"),
        col("rank_lo"), (col("rank_hi1") - 1).as("rank_hi"),
        expr("(p * (n - 1)) DIV 100").as("target"),
        greatest(lit(0L),
          col("rank_lo") - expr("(p * (n - 1)) DIV 100"),
          expr("(p * (n - 1)) DIV 100") - (col("rank_hi1") - 1))
          .as("rank_err"))
      .orderBy("event_type", "p")
  }
}
