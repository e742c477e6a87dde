package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** DECLARATIVE DATA-QUALITY CONSTRAINT AUDIT (the Deequ shape) — the
  * validation gate a pipeline runs before training data ships:
  * uniqueness, completeness, value-domain, range, and referential
  * integrity, each reported as (rule, n_checked, violations, passed).
  *
  * Scale posture: every single-table rule for a table rides ONE
  * aggregation over ONE scan (the per-rule counters are parallel
  * aggregates unpivoted by `stack`, like the ANALYZE profile); the two
  * referential rules are key-column anti-join counts — the only joins,
  * and they shuffle key columns only. Nothing is row-output-sized; the
  * report is rule-count rows.
  */
object Constraints {

  /** The audit over explicit relations — the spec feeds corrupted frames
    * through this to prove each rule actually fires.
    *
    * NULL-semantics note: multi-column `countDistinct(a, b)` would skip
    * rows with a NULL component (hiding a NULL-keyed duplicate from the
    * uniqueness rule) while DuckDB's row-value `count(DISTINCT (a, b))`
    * counts them — so the pk rule counts DISTINCT over a STRUCT instead:
    * a struct with NULL fields is itself non-NULL, both engines count
    * it, and NULL components compare equal inside the distinct on both.
    * Completeness of the key columns is additionally audited as its own
    * rules so NULL-keyed rows are visible, not just consistently hashed.
    */
  private[graft] def auditOf(orders: DataFrame, customer: DataFrame,
                             lineitem: DataFrame): DataFrame = {
    val oAgg = orders.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_complete"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_positive"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("v_domain"))
    val oRows = oAgg.select(col("n").as("n_checked"), expr(
      "stack(4, 'orders_orderkey_unique', v_unique," +
        " 'orders_custkey_complete', v_complete," +
        " 'orders_totalprice_positive', v_positive," +
        " 'orders_status_domain', v_domain) AS (rule, violations)"))
    val lAgg = lineitem.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) -
        countDistinct(struct(col("l_orderkey"), col("l_linenumber"))))
        .as("v_pk"),
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("v_okey"),
      sum(when(col("l_linenumber").isNull, 1L).otherwise(0L)).as("v_lnum"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("v_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
        .otherwise(0L)).as("v_disc"))
    val lRows = lAgg.select(col("n").as("n_checked"), expr(
      "stack(5, 'lineitem_pk_unique', v_pk," +
        " 'lineitem_orderkey_complete', v_okey," +
        " 'lineitem_linenumber_complete', v_lnum," +
        " 'lineitem_quantity_positive', v_qty," +
        " 'lineitem_discount_range', v_disc) AS (rule, violations)"))
    // referential integrity: anti-join counts over key columns only
    val fkO = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(oAgg.select(col("n").as("n_checked")))
      .select(col("n_checked"), lit("orders_custkey_fk").as("rule"),
        col("violations"))
    val fkL = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(lAgg.select(col("n").as("n_checked")))
      .select(col("n_checked"), lit("lineitem_orderkey_fk").as("rule"),
        col("violations"))
    oRows.unionByName(lRows).unionByName(fkO).unionByName(fkL)
      .select(col("rule"), col("n_checked"), col("violations"),
        (col("violations") === 0L).as("passed"))
      .orderBy("rule")
  }

  def constraintAudit(spark: SparkSession, sfDir: String): DataFrame =
    auditOf(Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.lineitem(spark, sfDir))
}
