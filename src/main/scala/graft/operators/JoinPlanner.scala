package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** MEASURED BROADCAST PLANNING — fixing the join decision static file
  * statistics get wrong. Spark's JoinSelection compares a relation's
  * `sizeInBytes` against `autoBroadcastJoinThreshold`, but without a CBO
  * filter estimate that size is the FILE size: a dimension table of 100 GB
  * filtered to 0.1% still "weighs" 100 GB at planning time, so the
  * optimizer plans a shuffle join and both sides pay an exchange. AQE can
  * rescue the probe side at runtime, but only AFTER the small side's map
  * stage has run and written shuffle files.
  *
  * This planner spends one cheap PRE-PASS instead: run the filtered,
  * projected dimension scan once (filters/pruning pushed to parquet — the
  * pass reads the dimension's pruned columns only, never the fact table),
  * measure actual rows, estimate bytes from the schema's row width, and
  * decide broadcast vs shuffle from MEASURED post-filter cardinality.
  * At 100 TB the arithmetic is lopsided: the pre-pass costs one dimension
  * scan, the win is eliminating the fact table's exchange entirely — the
  * fact side keeps its partitioning AND ordering. The decision threshold
  * is `spark.graft.measuredBroadcastThreshold` (default 10m, same shape
  * as `autoBroadcastJoinThreshold`).
  *
  * The measured count is planner metadata (one long), the same altitude
  * as AQE's runtime stats — not a data collect.
  */
object JoinPlanner {

  /** Last decision, for spec/plan observability. */
  @volatile private[graft] var lastDecision: Option[Boolean] = None

  private def thresholdBytes(spark: SparkSession): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.graft.measuredBroadcastThreshold", "10m"))

  /** Conservative per-row byte estimate from the schema (Catalyst's own
    * per-type defaults plus tuple overhead).
    */
  private[graft] def estimatedRowBytes(df: DataFrame): Long =
    df.schema.map(_.dataType.defaultSize.toLong).sum + 8L

  /** Join `fact` with the (already filtered/projected) `dim`, choosing
    * broadcast when the MEASURED dim cardinality fits the threshold;
    * otherwise fall through to the optimizer's shuffle strategy.
    */
  def measuredJoin(fact: DataFrame, dim: DataFrame, cond: Column,
                   joinType: String = "inner"): DataFrame = {
    fact.join(measuredSide(dim), cond, joinType)
  }

  /** USING-column variant of [[measuredJoin]] (one shared key column in
    * the output, the shape the scoring joins need).
    */
  def measuredJoinUsing(fact: DataFrame, dim: DataFrame,
                        usingCols: Seq[String],
                        joinType: String = "inner"): DataFrame =
    fact.join(measuredSide(dim), usingCols, joinType)

  /** The measured decision itself: return `dim` broadcast-hinted when its
    * MEASURED rows × schema width clear the threshold, bare (→ the
    * optimizer's shuffle strategy) otherwise. This is the guard every
    * model/vocabulary-grid scoring join must route through: a grid that is
    * tiny at test scale is 10⁸–10⁹ rows on a web corpus (the Zipf tail of
    * raw terms), and a FORCED `broadcast()` hint on it is an executor OOM,
    * not a slow plan — Spark honors the hint regardless of size.
    */
  def measuredSide(dim: DataFrame): DataFrame = {
    val limit = thresholdBytes(dim.sparkSession)
    val estBytes = dim.count() * estimatedRowBytes(dim)
    val small = limit >= 0 && estBytes <= limit
    lastDecision = Some(small)
    if (small) broadcast(dim) else dim
  }

  /** Declared query: order revenue by market segment for platinum-balance
    * customers — the filtered customer dimension is ~10% of the table, a
    * slice static stats can't see but the measured pre-pass can. The
    * result is decision-independent (broadcast and shuffle joins agree);
    * the DECISION is what MeasuredJoinSpec pins.
    */
  def segmentRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val platinum = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_mktsegment"))
    measuredJoin(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_totalprice")),
      platinum,
      col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("c_mktsegment")
  }

  val segmentRevenueOracleSql: String =
    """SELECT c_mktsegment,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_acctbal > 9000
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
}
