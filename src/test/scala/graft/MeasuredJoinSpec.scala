package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.JoinPlanner
import graft.sources.Tables

class MeasuredJoinSpec extends SparkTestBase {

  private def executedPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def vanillaSegmentRevenue: DataFrame =
    Tables.orders(spark, sf).select(col("o_custkey"), col("o_totalprice"))
      .join(Tables.customer(spark, sf)
          .filter(col("c_acctbal") > 9000)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("c_mktsegment")

  test("measured pre-pass broadcasts what static stats cannot") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // static stats see the unfiltered file size: with auto-broadcast off
    // the optimizer can never choose a broadcast on its own
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val vanilla = vanillaSegmentRevenue
      assert(!executedPlan(vanilla).contains("BroadcastHashJoin"),
        "control: without the measured hint the join must shuffle")
      val measured = JoinPlanner.segmentRevenue(spark, sf)
      val plan = executedPlan(measured)
      assert(JoinPlanner.lastDecision.contains(true))
      assert(plan.contains("BroadcastHashJoin"),
        s"measured decision must broadcast the filtered dimension:\n$plan")
      // the answer is decision-independent
      assert(measured.collect().toSeq == vanilla.collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("threshold 0 falls through to the optimizer's shuffle strategy") {
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.measuredBroadcastThreshold", "0")
    try {
      val plan = executedPlan(JoinPlanner.segmentRevenue(spark, sf))
      assert(JoinPlanner.lastDecision.contains(false))
      assert(!plan.contains("BroadcastHashJoin"),
        s"a zero budget must never broadcast:\n$plan")
    } finally {
      spark.conf.unset("spark.graft.measuredBroadcastThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("the pre-pass pushes the dimension filter into the scan") {
    val dim = Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val scan = dim.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,9000.0)]"),
      s"the measured count must ride a pushed-down scan:\n$scan")
  }

  /** The scale-hazard guard of the model-grid scoring joins: a raw-term
    * vocabulary grid is unbounded at corpus scale, so when its MEASURED
    * size exceeds the threshold the join must take the optimizer's
    * shuffle strategy instead of a forced broadcast (executor OOM at
    * 100 TB vocab sizes) — and the answer must not depend on the
    * decision. The single-key term join prints as `... [term#N], [term#M]`
    * in the executed plan, which the regexes below pin without tripping
    * on the (term, lang) model-assembly join.
    */
  private def assertGridJoinRouting(q: => DataFrame): Unit = {
    val shuffledTermJoin =
      "(?s).*(SortMergeJoin|ShuffledHashJoin)(\\(skew=true\\))? \\[term#\\d+[L]?\\],.*".r
    val broadcastTermJoin =
      "(?s).*BroadcastHashJoin \\[term#\\d+[L]?\\],.*".r
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.graft.measuredBroadcastThreshold", "0")
    // at test scale the grid is genuinely tiny, so AQE's own runtime stats
    // would (correctly) convert the unhinted shuffle join back to a
    // broadcast; disabling auto-broadcast stands in for "the grid really
    // is too big", which is the regime this guard exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = q
      val bigRows = big.collect().toSeq
      assert(JoinPlanner.lastDecision.contains(false),
        "an over-threshold grid must take the shuffle branch")
      val plan = big.queryExecution.executedPlan.toString
      assert(shuffledTermJoin.matches(plan),
        s"over-threshold grid join must shuffle on term:\n$plan")
      assert(!broadcastTermJoin.matches(plan),
        s"over-threshold grid must NOT be broadcast:\n$plan")
      spark.conf.unset("spark.graft.measuredBroadcastThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      val small = q
      val smallRows = small.collect().toSeq
      assert(JoinPlanner.lastDecision.contains(true),
        "the default threshold must broadcast the test-scale grid")
      assert(broadcastTermJoin.matches(
        small.queryExecution.executedPlan.toString),
        "under-threshold grid join must broadcast")
      assert(bigRows == smallRows, "the answer must be decision-independent")
    } finally {
      spark.conf.unset("spark.graft.measuredBroadcastThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("dsir scoring join routes through the measured decision") {
    assertGridJoinRouting(graft.operators.Sampling.dsirWeights(spark, sf))
  }

  test("naive-bayes predict scoring join routes through the measured decision") {
    assertGridJoinRouting(graft.operators.NaiveBayes.nbPredict(spark, sf))
  }

  test("row-width estimate covers the projected schema only") {
    val wide = Tables.customer(spark, sf)
    val narrow = wide.select("c_custkey")
    assert(JoinPlanner.estimatedRowBytes(narrow) <
      JoinPlanner.estimatedRowBytes(wide))
  }
}
