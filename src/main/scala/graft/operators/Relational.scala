package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational coverage over the TPC-H-ish tables — the join/agg/window
  * capabilities the north star demands at scale (absent in the reference,
  * whose only "join" is annotating postings with a constant doc name,
  * `/root/reference/helper_reduce.c:153`).
  *
  * Numeric contract for oracle hash-matching: money aggregates are summed
  * in exact DECIMAL then cast to double (values ≤ ~1e15 so the double is
  * exact); averages of doubles are rounded to 4 dp (FP divergence across
  * engines is ~1e-11 relative — orders of magnitude inside the margin).
  *
  * Scale notes: dimension tables (region, nation) are broadcast; the
  * orders⋈lineitem join shuffles on the orderkey both sides already
  * share; AQE handles skew at real scale.
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** TPC-H Q1: pricing summary report. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
          * (lit(1).cast("decimal(12,2)") + dec(col("l_tax"))))
          .cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: top-10 highest-revenue orders still unshipped at the
    * cutoff, for one market segment.
    */
  def q3TopUnshipped(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue per nation for one region/year where supplier
    * and customer are in the same nation. Small dims broadcast.
    */
  def q5RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
               col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Top-3 parts per brand by revenue — the window/rank showcase. */
  def partsTopPerBrand(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(desc("revenue"), col("p_partkey"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rnk")
      .orderBy("p_brand", "rnk")
  }

  /** Hierarchical ROLLUP over status → priority: subtotal and grand-total
    * rows with exact decimal sums (grouping-set coverage).
    */
  def ordersRollupCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Exact interpolated percentiles of event values per type (the
    * nearest-rank-free `percentile` both engines define identically as
    * linear interpolation at rank (n−1)·p).
    */
  def valuePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  /** Customers with no orders at all — left-anti join (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Suppliers that shipped at least one line item — left-semi (EXISTS). */
  def suppliersWithShipments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.supplier(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")

  /** Parts priced above their brand's average — written as CORRELATED
    * scalar subqueries on purpose: Catalyst's subquery decorrelation
    * (RewriteCorrelatedScalarSubquery) turns each into an aggregate +
    * join, so the executed plan is shuffle-joins over a per-brand
    * aggregate, never a per-row re-scan. The above-average test runs in
    * exact decimal arithmetic (price·n > sum avoids an inexact divide);
    * the reported brand aggregates are an exact sum and a count, so both
    * engines hash-match bit-for-bit.
    */
  def partsAboveBrandAvg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("graft_part")
    spark.sql(
      """SELECT p_partkey, p_brand, p_retailprice,
        |       (SELECT COUNT(*) FROM graft_part p2
        |        WHERE p2.p_brand = p.p_brand) AS brand_n,
        |       (SELECT CAST(SUM(CAST(p3.p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
        |        FROM graft_part p3
        |        WHERE p3.p_brand = p.p_brand) AS brand_sum
        |FROM graft_part p
        |WHERE CAST(p_retailprice AS DECIMAL(12,2)) *
        |      (SELECT COUNT(*) FROM graft_part p4 WHERE p4.p_brand = p.p_brand)
        |      > (SELECT SUM(CAST(p5.p_retailprice AS DECIMAL(12,2)))
        |         FROM graft_part p5 WHERE p5.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** Bilateral trade volume between two nations by ship year — the TPC-H
    * Q7 shape: lineitem→supplier→nation on one side, lineitem→orders→
    * customer→nation on the other, with the nation dimension playing TWO
    * roles. Only nation (25 rows) is explicitly broadcast — supplier,
    * orders and customer grow with the corpus (fact-scale at 100 TB), so
    * they join on their shared keys and AQE promotes them to broadcast at
    * small SF where they fit. Revenue in exact decimal, cast to double at
    * the edge.
    */
  def nationTrade(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val n1 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    li.join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .where((col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_11")
        || (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_19"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** TPC-H Q15 shape — top supplier(s) by revenue inside a shipdate
    * window. The "view + max over the view" pattern: the revenue relation
    * is aggregated once, its max is a 1-row broadcast joined back for the
    * equality filter (Catalyst would decorrelate the textbook correlated
    * form to exactly this), and only then does the small winner set join
    * the supplier dimension. Exact DECIMAL revenue end-to-end: the
    * equality against the max is bit-exact, no double drift can drop or
    * duplicate a winner.
    */
  def topRevenueSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q18 shape — large-volume orders: customers whose order's total
    * lineitem quantity exceeds the threshold. The HAVING subquery becomes
    * an aggregate + semi-join-shaped inner join on orderkey; quantity
    * totals in exact DECIMAL so the threshold cut is engine-agreed.
    * The qualifying-order set is tiny (top ~1% of orders), so the
    * customer/orders joins run over the winners, not the fact table.
    */
  def largeQuantityOrders(spark: SparkSession, sfDir: String,
                          minQty: Int): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > lit(minQty).cast("decimal(12,2)"))
    big
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q6 shape — the forecast-revenue scalar — expressed through the
    * SQL FRONT END (`spark.sql` over a registered view) rather than the
    * DataFrame API: proves the full SQL surface resolves, optimizes, and
    * executes graft's tables identically (same Catalyst plan either way;
    * the oracle runs the same text). The discount/quantity predicates
    * push down AND row-group-skip; the shipdate predicate pushes but the
    * NTZ source column cannot skip on it (the Spark-4 limitation the
    * Z-clustered layout fixes by rewriting to LTZ micros — see
    * [[Clustering.ensureClustered]]). Aggregation is a map-side partial
    * + 1-row final.
    */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM graft_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)
  }

  /** TPC-H Q14 shape — promo revenue share for one shipdate month:
    * conditional aggregation (CASE inside sum) over the lineitem⋈part
    * join. Both sums are exact DECIMAL cast to double only at the edge;
    * the share divides those two doubles, so all three outputs are
    * bit-identical across engines.
    */
  def promoRevenueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      // sum(CASE ... END) with no else: nulls drop out of the sum — the
      // same semantics DuckDB's bare CASE gives, no 0-literal type games
      .agg(
        sum(when(col("p_type") === "PROMO", rev)).cast("double")
          .as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
          .as("promo_share"))
  }

  /** TPC-H Q19 shape — disjunctive multi-column predicates (OR of ANDed
    * brand/size/quantity ranges): the scan-pushdown stress case, since
    * each disjunct constrains DIFFERENT tables' columns. The part-side
    * disjuncts prune the dimension before the join; the residual OR
    * applies post-join. Exact decimal revenue.
    */
  def brandRangeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val d1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1, 20)
    val d2 = col("p_brand") === "Brand#2" && col("p_size").between(5, 25) &&
      col("l_quantity").between(10, 40)
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .where(d1 || d2)
      .agg(
        sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private def revenue: Column =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))

  /** TPC-H Q8 shape — national market share: of all revenue a region's
    * customers spent on one part type across two order years, the share
    * supplied by one nation, per year. The nation dimension again plays
    * two roles (customer's region membership, supplier's identity); the
    * share is a conditional-sum / total-sum divide of two exact-decimal
    * sums cast to double at the edge (the Q14 contract).
    */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "AMERICA")
    val nCust = Tables.nation(spark, sfDir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val nSupp = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", revenue)).cast("double")
          .as("nation_revenue"),
        sum(revenue).cast("double").as("total_revenue"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        round(col("nation_revenue") / col("total_revenue"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q10 shape — returned-item revenue: customers ranked by the
    * revenue they returned in one quarter. Revenue-desc top 20 with the
    * custkey tiebreak mirrored in the oracle so boundary ties cannot
    * reorder across engines.
    */
  def returnedItemRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1996-10-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  /** TPC-H Q13 shape — customer order-count distribution: left join keeps
    * order-less customers as count 0, then the counts are themselves
    * counted. Two aggregations over different keys; the first rides the
    * custkey shuffle, the second is a near-trivial rollup of ≤ a few
    * hundred distinct counts.
    */
  def customerOrderDistribution(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** TPC-H Q17 shape — small-quantity revenue for one brand: lines whose
    * quantity is below 20% of their part's average quantity. The
    * correlated average becomes a per-part aggregate joined back; the
    * below-one-fifth-of-average test runs in EXACT integer-scaled decimal
    * (5·qty·n < Σqty — no divide, so no FP boundary can flip a row), and
    * only the final yearly average divides.
    */
  def smallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val brandLines = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#3"),
        col("l_partkey") === col("p_partkey"))
    val perPart = brandLines
      .groupBy(col("l_partkey").as("ap_key"))
      .agg(count(lit(1)).as("n_lines"), sum(dec(col("l_quantity"))).as("qty_sum"))
    brandLines
      .join(perPart, col("l_partkey") === col("ap_key"))
      .filter(dec(col("l_quantity")) * lit(5).cast("decimal(12,2)") * col("n_lines")
        < col("qty_sum"))
      .agg(
        (sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4 shape — priority counts of orders with at least one LATE
    * line (shipped > 90 days after the order date; the corpus carries no
    * commit/receipt dates, so lateness is defined against o_orderdate —
    * same EXISTS-on-two-table-predicate decorrelation shape). The semi
    * join keeps each qualifying order once no matter how many lines were
    * late.
    */
  def lateOrderPriorities(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q9 shape — revenue by supplier nation and order year for one
    * part family (name-substring filter; the corpus has no partsupp, so
    * profit is discounted revenue without the supply-cost term). The
    * filtered part dimension prunes the fact join first; nation is
    * broadcast.
    */
  def profitByNationYear(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revenue).cast("double").as("sum_profit"))
      .orderBy(col("nation"), desc("o_year"))

  /** TPC-H Q22 shape — untapped customers: above-average positive account
    * balance and LAPSED (no order since the cutoff — every customer in
    * this corpus has some order, so "no orders ever" would be vacuously
    * empty; the original's seven-year-dormancy intent maps to a recency
    * anti join), grouped by nation (the corpus has no phone column, so
    * nation replaces the country-code substring). The global average is a
    * 1-row broadcast and the above-average test is exact (bal·n > Σbal in
    * decimal); the recency check is an anti join against the
    * date-filtered orders.
    */
  def globalSalesOpportunity(spark: SparkSession, sfDir: String): DataFrame = {
    val posStats = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 0.0)
      .agg(count(lit(1)).as("n_pos"),
        sum(dec(col("c_acctbal"))).as("bal_sum"))
    Tables.customer(spark, sfDir)
      .crossJoin(broadcast(posStats))
      .filter(dec(col("c_acctbal")) * col("n_pos") > col("bal_sum"))
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("n_name")
  }

  /** TPC-H Q21 shape — suppliers SOLELY to blame for late multi-supplier
    * orders (late = shipped > 90 days after the order date, as in
    * [[lateOrderPriorities]]). The textbook EXISTS / NOT-EXISTS pair over
    * other lineitems of the same order is computed as per-(order,supplier)
    * lateness flags then ONE per-order rollup — each order contributes its
    * supplier count and late-supplier count, and "blame" is the exact
    * integer test late ∧ n_supps ≥ 2 ∧ n_late = 1. One orderkey shuffle
    * serves both aggregation levels; no correlated re-scan per lineitem.
    */
  def blameSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val perOrderSupp = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L).otherwise(0L))
        .as("late"))
    val perOrder = perOrderSupp.groupBy(col("l_orderkey").as("o_key"))
      .agg(count(lit(1)).as("n_supps"), sum(col("late")).as("n_late"))
    perOrderSupp
      .filter(col("late") === 1L)
      .join(perOrder, col("l_orderkey") === col("o_key"))
      .filter(col("n_supps") >= 2 && col("n_late") === 1L)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_suppkey"))
      .limit(20)
  }

  /** Distribution-rank window functions: each part's price position
    * within its brand as percent_rank and cume_dist (both rank-based, so
    * with the unique (price, partkey) ordering they are engine-exact —
    * unlike ntile, whose bucket-boundary arithmetic differs between
    * engines). The window rides one brand-keyed exchange; the output is
    * sampled to every 50th part so the result stays bounded while the
    * window still computes over the full dimension.
    */
  def pricePosition(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .filter(col("p_partkey") % 50 === 0)
      .orderBy("p_partkey")
  }

  /** TPC-H Q2 shape — cheapest supplier per part (argmin join). The
    * part⋈supplier cost relation here is derived from lineitem (the
    * corpus has no partsupp table): a supplier's offer price for a part is
    * the MIN extendedprice it ever shipped that part at, restricted to one
    * region through the supplier→nation→region dimension chain. The
    * textbook correlated `ps_supplycost = (SELECT min ...)` becomes a
    * per-part min aggregated once and equality-joined back — the argmin
    * rides the same partkey shuffle as the offers themselves. Ordering is
    * total (acctbal desc, then both keys), so LIMIT is deterministic.
    */
  def minCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val regionSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    // one explicit partkey exchange clusters BOTH the offers aggregation
    // and the per-part min window (argmin-via-window reads the offers
    // relation once — the groupBy+join-back form would recompute it and
    // reshuffle each level); supplier is NOT broadcast: it scales with SF
    val offers = Tables.lineitem(spark, sfDir)
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
      .agg(min(dec(col("l_extendedprice"))).as("cost"))
    offers
      .withColumn("best_cost",
        min(col("cost")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("cost") === col("best_cost"))
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "STANDARD"),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost").cast("double").as("cost"))
      .orderBy(desc("s_acctbal"), col("p_partkey"), col("s_name"))
      .limit(100)
  }

  /** TPC-H Q11 shape — "important" parts: those holding an above-average
    * share of one nation's shipped value. The textbook HAVING-vs-scalar-
    * subquery is the per-part value aggregation plus a 1-row grand total
    * (sum + part count from the SAME relation) cross-joined back — the
    * threshold `value · n_parts > 2 · total` (share > 2× the mean) is
    * scale-free, so the query stays non-degenerate at every SF, and exact:
    * decimal times integer on both sides of the inequality.
    */
  def importantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val natValue = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_19")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("value"))
    val total = natValue.agg(sum(col("value")).as("grand_total"),
      count(lit(1)).as("n_parts"))
    natValue.crossJoin(broadcast(total))
      .filter(col("value") * col("n_parts") > col("grand_total") * 2)
      .select(col("l_partkey").as("p_key"), col("value").cast("double").as("value"))
      .orderBy(desc("value"), col("p_key"))
  }

  /** TPC-H Q16 shape — supplier diversity per part class, excluding a
    * subquery-defined supplier set. The partsupp relation is the DISTINCT
    * (part, supplier) pairs observed in lineitem; the exclusion (Q16's
    * "complaints" suppliers, a static predicate on the supplier table —
    * here low account balance) is applied as a LEFT ANTI join (the NOT IN
    * of the textbook form without its NULL trap). countDistinct rides the
    * (brand, type, size) shuffle; both dimension sides broadcast.
    */
  def partSupplierDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val complained = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 2000)
      .select(col("s_suppkey").as("bad_supp"))
    li.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(complained), col("l_suppkey") === col("bad_supp"), "left_anti")
      .join(Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q20 shape — suppliers who dominated a part's volume: shipped
    * MORE THAN HALF of some PROMO part's 1996 quantity. The nested
    * correlated subqueries (availqty vs half the part's demand) become a
    * per-(part,supplier) quantity rollup, a per-part total over the same
    * relation, and the exact decimal test `2·sq > total_q`; qualifying
    * pairs then pick the supplier dimension via LEFT SEMI join (EXISTS, so
    * a supplier dominating several parts still appears once). Quantities
    * are summed in DECIMAL — double sums would be addend-order-dependent
    * and could flip the strict inequality at the boundary.
    */
  def dominantSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    // one explicit partkey exchange feeds BOTH aggregation levels and the
    // join back (HashPartitioning(partkey) clusters (partkey, suppkey)
    // too), so the threshold costs one shuffle of the filtered fact, not
    // three — and the qualifying pairs are a broadcast-sized semi side
    val perPS = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, sfDir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
    val perPart = perPS.groupBy(col("l_partkey").as("pp_key"))
      .agg(sum(col("sq")).as("total_q"))
    val dominant = perPS
      .join(perPart, col("l_partkey") === col("pp_key"))
      .filter(col("sq") * 2 > col("total_q"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, sfDir)
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q12 shape — the two-bucket CASE pivot: per return flag, how
    * many severely late 1997 lines carried critical vs non-critical order
    * priorities (the corpus has no shipmode/commitdate columns, so the
    * flag plays the mode and "late" is shipped > 60 days after ordering).
    * One orderkey-shuffle join, then both conditional sums ride a single
    * returnflag aggregation — the same plan Q12's CASE pair compiles to.
    */
  def latePriorityPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val critical = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .filter(year(col("l_shipdate")) === 1997 &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** ANALYZE-style exact column profile — the statistics a cost-based
    * optimizer collects (min/max/null-count/NDV per column), computed in
    * ONE scan: all twelve aggregates ride a single pass and the wide
    * 1-row result is unpivoted with `stack` into one row per column. The
    * three exact countDistincts expand the scan 3× (Spark's
    * distinct-aggregate rewrite); the sketch-based alternative for
    * wider profiles is [[IndexQueries.vocabApprox]]'s HLL path.
    */
  def tableProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_ndv"))
    }
    Tables.lineitem(spark, sfDir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.length}, " +
        cols.map(c => s"'$c', ${c}_min, ${c}_max, ${c}_nulls, ${c}_ndv")
          .mkString(", ") +
        ") AS (col_name, min_v, max_v, n_nulls, n_distinct)")
      .orderBy("col_name")
  }

  /** Brand quantity rollup under a RUNTIME Bloom-filter join: the
    * selective brand predicate sits on `part`, but at 100 TB the dim side
    * is too big to broadcast — the join shuffles BOTH sides, and without a
    * runtime filter every lineitem row pays the exchange only to be
    * dropped at the join. `InjectRuntimeFilter` builds a Bloom filter over
    * the surviving `p_partkey`s and pushes a `might_contain` predicate
    * into the fact scan, so non-matching fact rows die BEFORE the shuffle
    * — the row-level sibling of partition-level DPP
    * ([[PartitionedCorpus.dppLangRollup]]).
    *
    * The injection thresholds are sized for 10 GB+ scans, so this query
    * pins them (and disables broadcast, modeling the big-dim reality)
    * only for the duration of PLANNING: `executedPlan` is forced inside
    * the conf window — a lazy val, so the returned frame executes the
    * captured Bloom-filtered plan — and every conf is restored before
    * returning. The spec asserts `might_contain` is present and the
    * result matches the plain join.
    */
  def runtimeFilteredBrandQty(spark: SparkSession, sfDir: String,
                              brand: String = "Brand#23"): DataFrame = {
    val pinned = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_quantity"))
        .join(Tables.part(spark, sfDir)
          .filter(col("p_brand") === brand)
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("total_qty"))
        .orderBy("p_brand")
      df.queryExecution.executedPlan // force planning under the pinned confs
      df
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Order status/priority rollup with exact decimal totals. */
  def ordersRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("total_price"),
        round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
}
