package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.operators.Bucketing

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join + same-key agg run with zero shuffle exchanges") {
    // force the sort-merge path (broadcast would also be shuffle-free but
    // proves nothing about bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketing.orderRevenueUnordered(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"expected exchange-free bucketed plan, found:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed join result matches the plain parquet join") {
    val bucketed = Bucketing.bucketedOrderRevenue(spark, sf)
      .as[(Long, String, Double)].collect().toSeq
    val plain = {
      val o = graft.sources.Tables.orders(spark, sf)
      val l = graft.sources.Tables.lineitem(spark, sf)
      import org.apache.spark.sql.functions._
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("rev"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("rev").cast("double").as("revenue"))
        .orderBy("o_orderkey")
        .as[(Long, String, Double)].collect().toSeq
    }
    assert(bucketed === plain)
  }
}
