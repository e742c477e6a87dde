package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** AQE-on companions to PlanBudgetSpec for the join-heaviest queries:
  * PlanBudgetSpec pins the STATIC plan (AQE off); production runs with
  * AQE on, where runtime re-planning could silently demote a broadcast
  * decision to a shuffle join (e.g. a stage-stats misestimate) or add
  * exchanges. These tests EXECUTE each query under AQE and assert the
  * final adaptive plan kept every broadcast the static plan had and
  * stayed within the same shuffle budget.
  */
class AqePlanSpec extends SparkTestBase {

  // (query, static shuffle budget from PlanBudgetSpec)
  private val cases: Seq[(String, Int)] = Seq(
    "q21_blame_supplier" -> 5,
    "q_nation_trade"     -> 2,
    "q9_profit_nation"   -> 2,
    "q_bucketed_join"    -> 1,
    "q_skew_join"        -> 2,
    // round-12 join-bearing additions: the triangle closing joins and
    // the rule table's item-count joins must keep their shapes under
    // runtime re-planning
    "q_copurchase_triangles" -> 4,
    "q_basket_rules"         -> 6)

  /** Flatten an executed adaptive plan across query-stage boundaries:
    * QueryStageExec is a leaf node, so a plain `collect` sees only the
    * FINAL stage — upstream stages (where the join exchanges live) hang
    * off `stage.plan` and must be walked explicitly.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: QueryStageExec     => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _                     => p.children
    }
    p +: kids.flatMap(flatten)
  }

  private def finalAdaptivePlan(df: DataFrame): SparkPlan = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  cases.foreach { case (name, budget) =>
    test(s"$name under AQE: broadcasts survive re-planning, shuffles <= $budget") {
      // static baseline: how many broadcast hash joins the AQE-off plan has
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val staticBhj =
        try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
          .collect { case b: BroadcastHashJoinExec => b }.size
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")

      val nodes = flatten(finalAdaptivePlan(SparkEntry.queries(name)(spark, sf)))
      val aqeBhj = nodes.collect { case b: BroadcastHashJoinExec => b }.size
      // identity-dedup: a reused exchange reached via two stages is ONE
      // physical shuffle
      val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
        .map(System.identityHashCode).distinct.size

      assert(aqeBhj >= staticBhj,
        s"$name: AQE demoted a broadcast join ($staticBhj static " +
          s"BroadcastHashJoin -> $aqeBhj adaptive)")
      assert(shuffles <= budget,
        s"$name: adaptive plan runs $shuffles shuffles, static budget $budget")
    }
  }

  test("q_asof_native under AQE: the custom exec survives re-planning") {
    // AQE wraps the custom operator's children in query stages; the
    // planner must still satisfy AsOfJoinExec's distribution/ordering
    // contract and keep the node itself in the final adaptive plan
    val nodes = flatten(finalAdaptivePlan(
      SparkEntry.queries("q_asof_native")(spark, sf)))
    val asof = nodes.collect { case a: graft.plans.AsOfJoinExec => a }
    assert(asof.size === 1, "AsOfJoinExec missing from the adaptive plan")
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
      .map(System.identityHashCode).distinct.size
    assert(shuffles <= 3)
  }
}
