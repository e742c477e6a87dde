package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** CLOSED-FORM DISTRIBUTED LINEAR REGRESSION — the data-quality model a
  * curation pipeline actually ships (a linear scorer over cheap features)
  * trained in ONE aggregation pass, no gradient loop, no driver-side data.
  *
  * The trick is the normal equations: for y ≈ b0 + b1·x1 + b2·x2 the
  * least-squares solution is a pure function of ten MOMENTS (n, Σx1, Σx2,
  * Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y, Σy²). Moments are plain sums —
  * map-side-combinable, mergeable, one shuffle of ten longs per partition
  * — so at 100 TB the model trains for the cost of a single scan, and the
  * solve (Cramer's rule on a 3×3) is arithmetic on one row. That
  * mergeability is also why the incremental and streaming twins are EXACT,
  * not approximate: moments(base ∪ Δ) = moments(base) + moments(Δ),
  * integer-exact, so the refreshed betas are bit-identical to a
  * from-scratch retrain.
  *
  * Engine parity (the reason this is DuckDB-oracle-checkable at all):
  *  - every moment is an exact BIGINT sum over integral features — line
  *    count, integral quantity, and order revenue summed as integer CENTS
  *    per line (tie-safe: ×100 of a cents-valued double never lands
  *    exactly on .5) then floored to whole dollars, so the target is
  *    independent of double summation order;
  *  - the double-precision solve is defined ONCE as SQL fragment strings
  *    ([[castSelect]]/[[detSelect]]/[[betaSelect]]/[[fitSelect]]) that
  *    BOTH engines evaluate over the identical integer moments — same
  *    expression tree, same IEEE ops, bit-identical betas. (Catalyst does
  *    not reassociate floating-point arithmetic.)
  *
  * Scale notes: Σy² with whole-dollar y (≤ ~6e5) stays inside int64 up to
  * ~10 TB of orders; beyond that swap the moment sums to DECIMAL(38,0)
  * (still exact, still mergeable) or center the features first. The
  * features come from the lineitem→order rollup, one orderkey-hash
  * shuffle; the per-group variant keeps the whole fit in the plan (no
  * collect anywhere — the betas are columns).
  */
object LinearModel {

  /** Per-line price in exact integer cents — ×100 of a cents-valued
    * double never lands exactly on .5, so round() agrees across engines.
    */
  private[graft] val centsExpr = "CAST(round(l_extendedprice * 100) AS BIGINT)"

  /** Integer cents → whole dollars (cents < 2^53, so the double division
    * is exact-enough for floor to agree everywhere; tie-free).
    */
  private[graft] val dollarsOfCents =
    "CAST(floor(CAST(cents AS DOUBLE) / 100) AS BIGINT) AS y"

  /** Per-order features: x1 = line count, x2 = total quantity (integral
    * in the data; spec-asserted), y = order revenue in whole dollars,
    * summed as exact integer CENTS per line first so the total is
    * independent of summation order. One orderkey shuffle; the orders
    * side (for the group column) joins on its own key.
    */
  private[graft] def orderFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("okey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("x1"),
        sum(col("l_quantity").cast("long")).as("x2"),
        sum(expr(centsExpr)).as("cents"))
      .selectExpr("okey", "o_orderpriority", "x1", "x2", dollarsOfCents)

  /** The ten exact integer moments, as aggregate columns. */
  private[graft] def momentAggs = Seq(
    count(lit(1)).as("n"),
    sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
    sum(col("x1") * col("x1")).as("s11"),
    sum(col("x2") * col("x2")).as("s22"),
    sum(col("x1") * col("x2")).as("s12"),
    sum(col("x1") * col("y")).as("s1y"),
    sum(col("x2") * col("y")).as("s2y"),
    sum(col("y") * col("y")).as("syy"))

  // ---- the SHARED solve: identical fragment strings for both engines ----

  private[graft] val momentCols =
    Seq("n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y", "syy")

  /** Integer moments → doubles (exact CAST of identical integers). */
  private[graft] val castSelect: Seq[String] =
    "n" +: momentCols.map(c => s"CAST($c AS DOUBLE) AS ${c}d")

  /** det of the 3×3 Gram matrix [[n s1 s2][s1 s11 s12][s2 s12 s22]]. */
  private[graft] val detSelect =
    "nd*(s11d*s22d - s12d*s12d) - s1d*(s1d*s22d - s12d*s2d) + s2d*(s1d*s12d - s11d*s2d) AS det"

  /** Cramer's rule, columns of the Gram matrix replaced by the RHS. */
  private[graft] val betaSelect = Seq(
    "(syd*(s11d*s22d - s12d*s12d) - s1d*(s1yd*s22d - s12d*s2yd) + s2d*(s1yd*s12d - s11d*s2yd)) / det AS b0",
    "(nd*(s1yd*s22d - s12d*s2yd) - syd*(s1d*s22d - s12d*s2d) + s2d*(s1d*s2yd - s1yd*s2d)) / det AS b1",
    "(nd*(s11d*s2yd - s1yd*s12d) - s1d*(s1d*s2yd - s1yd*s2d) + syd*(s1d*s12d - s11d*s2d)) / det AS b2")

  /** Error decomposition from the same moments (no second data pass). */
  private[graft] val fitSelect = Seq(
    "syyd - (b0*syd + b1*s1yd + b2*s2yd) AS sse",
    "syyd - syd*syd/nd AS sst")

  private[graft] val reportSelect = Seq(
    "n", "b0", "b1", "b2", "1 - sse/sst AS r2", "sqrt(sse/nd) AS rmse")

  /** Moments row(s) → fit report, via the shared fragments. `keep` carries
    * group columns through each step.
    */
  private[graft] def solve(moments: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val k = keep
    moments
      .selectExpr(k ++ castSelect: _*)
      .selectExpr("*", detSelect)
      .selectExpr(Seq("*") ++ betaSelect: _*)
      .selectExpr(Seq("*") ++ fitSelect: _*)
      .selectExpr(k ++ reportSelect: _*)
  }

  /** Global fit: one row — n, b0, b1, b2, r2, rmse. Whole pipeline is one
    * scan + one ten-long-wide aggregation; the solve is plan arithmetic on
    * the single moments row (no collect).
    */
  def linearFit(spark: SparkSession, sfDir: String): DataFrame =
    solve(orderFeatures(spark, sfDir).agg(momentAggs.head, momentAggs.tail: _*))

  /** Per-priority fits — MANY models in one shuffle, betas as columns,
    * zero driver involvement: the 100 TB shape for per-slice models
    * (per language, per source, per domain).
    */
  def groupedFit(spark: SparkSession, sfDir: String): DataFrame =
    solve(
      orderFeatures(spark, sfDir)
        .groupBy("o_orderpriority")
        .agg(momentAggs.head, momentAggs.tail: _*),
      keep = Seq("o_orderpriority"))
      .orderBy("o_orderpriority")

  /** Residual outliers: score every order with the fitted model and keep
    * the top-k by |residual|. The betas ride a broadcast of the one-row
    * fit (a cross join with a 1-row side — no data movement on the fact
    * side), scoring is row-local, and the top-k is TakeOrderedAndProject.
    */
  def residualOutliers(spark: SparkSession, sfDir: String, topK: Int = 15): DataFrame = {
    val betas = broadcast(linearFit(spark, sfDir).selectExpr("b0", "b1", "b2"))
    orderFeatures(spark, sfDir)
      .crossJoin(betas)
      .selectExpr("okey AS o_orderkey", "x1 AS n_lines", "x2 AS sum_qty",
        "y AS y_dollars",
        "CAST(y AS DOUBLE) - (b0 + b1*CAST(x1 AS DOUBLE) + b2*CAST(x2 AS DOUBLE)) AS resid")
      .orderBy(abs(col("resid")).desc, col("o_orderkey"))
      .limit(topK)
  }

  private val scratch = new graft.util.ScratchSlot

  /** Incremental retrain: the stored moments (ten longs on disk) plus the
    * delta batch's moments, summed — the base orders are NEVER re-read.
    * Exact by integer-sum associativity, proven by answering the identical
    * monolithic oracle. The split is by order date, so every order's
    * feature row lands wholly in one side.
    */
  def linearFitIncremental(spark: SparkSession, sfDir: String,
                           splitAt: String = "1997-07-01"): DataFrame = {
    scratch.retire()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_linear_")
    scratch.defer(() => graft.util.Scratch.deleteRecursively(dir))
    val split = lit(splitAt).cast("timestamp")

    def momentsOfOrders(orders: DataFrame): DataFrame =
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("okey"))
        .agg(count(lit(1)).as("x1"),
          sum(col("l_quantity").cast("long")).as("x2"),
          sum(expr(centsExpr)).as("cents"))
        .selectExpr("okey", "x1", "x2", dollarsOfCents)
        .agg(momentAggs.head, momentAggs.tail: _*)

    val basePath = dir.resolve("moments_state").toString
    momentsOfOrders(Tables.orders(spark, sfDir).filter(col("o_orderdate") < split))
      .write.mode("overwrite").parquet(basePath)

    val delta = momentsOfOrders(
      Tables.orders(spark, sfDir).filter(col("o_orderdate") >= split))
    val merged = spark.read.parquet(basePath)
      .unionByName(delta)
      .agg(sum("n").as("n"),
        sum("s1").as("s1"), sum("s2").as("s2"), sum("sy").as("sy"),
        sum("s11").as("s11"), sum("s22").as("s22"), sum("s12").as("s12"),
        sum("s1y").as("s1y"), sum("s2y").as("s2y"), sum("syy").as("syy"))
    solve(merged)
  }

  // ---- the DuckDB oracle, built from the SAME fragments ----

  /** Feature CTE body shared by every oracle (semantically identical to
    * [[orderFeatures]]; integer-exact, so formulation differences can't
    * show).
    */
  private val featsCte =
    s"""f0 AS (
       |  SELECT l.l_orderkey AS okey, o.o_orderpriority,
       |         CAST(count(*) AS BIGINT) AS x1,
       |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2,
       |         CAST(sum($centsExpr) AS BIGINT) AS cents
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY l.l_orderkey, o.o_orderpriority),
       |f AS (SELECT okey, o_orderpriority, x1, x2, $dollarsOfCents FROM f0)""".stripMargin

  private def momentsSql(groupCol: Option[String]): String = {
    val g = groupCol.map(c => s"$c, ").getOrElse("")
    val by = groupCol.map(c => s" GROUP BY $c").getOrElse("")
    s"""m AS (
       |  SELECT ${g}CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
       |         CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x1*x1) AS BIGINT) AS s11,
       |         CAST(sum(x2*x2) AS BIGINT) AS s22,
       |         CAST(sum(x1*x2) AS BIGINT) AS s12,
       |         CAST(sum(x1*y) AS BIGINT) AS s1y,
       |         CAST(sum(x2*y) AS BIGINT) AS s2y,
       |         CAST(sum(y*y) AS BIGINT) AS syy
       |  FROM f$by)""".stripMargin
  }

  private def solveSql(keep: Seq[String]): String = {
    val k = if (keep.isEmpty) "" else keep.mkString("", ", ", ", ")
    s"""d0 AS (SELECT $k${castSelect.mkString(", ")} FROM m),
       |d1 AS (SELECT *, $detSelect FROM d0),
       |d2 AS (SELECT *, ${betaSelect.mkString(", ")} FROM d1),
       |d3 AS (SELECT *, ${fitSelect.mkString(", ")} FROM d2)""".stripMargin
  }

  /** Oracle for [[linearFit]] (and, identically, the incremental and
    * streaming twins — that identity IS the proof).
    */
  val fitOracleSql: String =
    s"""WITH $featsCte,
       |${momentsSql(None)},
       |${solveSql(Nil)}
       |SELECT ${reportSelect.mkString(", ")} FROM d3""".stripMargin

  /** Oracle for [[groupedFit]]. */
  val groupedOracleSql: String =
    s"""WITH $featsCte,
       |${momentsSql(Some("o_orderpriority"))},
       |${solveSql(Seq("o_orderpriority"))}
       |SELECT o_orderpriority, ${reportSelect.mkString(", ")} FROM d3
       |ORDER BY o_orderpriority""".stripMargin

  /** Oracle for [[residualOutliers]]. */
  def outliersOracleSql(topK: Int = 15): String =
    s"""WITH $featsCte,
       |${momentsSql(None)},
       |${solveSql(Nil)}
       |SELECT okey AS o_orderkey, x1 AS n_lines, x2 AS sum_qty,
       |       y AS y_dollars,
       |       CAST(y AS DOUBLE) - (b0 + b1*CAST(x1 AS DOUBLE) + b2*CAST(x2 AS DOUBLE)) AS resid
       |FROM f, d3
       |ORDER BY abs(CAST(y AS DOUBLE) - (b0 + b1*CAST(x1 AS DOUBLE) + b2*CAST(x2 AS DOUBLE))) DESC,
       |         okey
       |LIMIT $topK""".stripMargin
}
