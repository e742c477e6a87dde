package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Every declared query must execute at sf0.001 with rows, a stable
  * schema, AND a cartesian-free final plan — the fast regression net for
  * the whole SparkEntry surface. The plan sweep is the repo-wide scale
  * invariant the per-query budgets (PlanBudgetSpec) sample: a
  * CartesianProductExec anywhere is |L|×|R| work at 100 TB regardless of
  * how small it is at test SF, so NO query may ever plan one (intended
  * tiny-side cross joins must broadcast — BroadcastNestedLoopJoin with a
  * 1-row side — which this check deliberately permits).
  */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: QueryStageExec     => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _                     => p.children
    }
    p +: kids.flatMap(flatten)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with non-degenerate output and plan") {
      val df = fn(spark, sf)
      val n = df.collect().length.toLong // executes → finalizes AQE plan
      assert(df.columns.nonEmpty)
      // empty results are legal only for similarity-threshold queries,
      // which may have no qualifying pairs at the smallest scale
      if (!Set("q_neardup_jaccard", "q_minhash_lsh", "q_cust_no_orders")
            .contains(name))
        assert(n > 0, s"$name returned 0 rows at sf0.001")
      val cartesians = flatten(df.queryExecution.executedPlan)
        .collect { case c: CartesianProductExec => c }
      assert(cartesians.isEmpty,
        s"$name plans a CartesianProduct — |L|×|R| at scale:\n" +
          df.queryExecution.executedPlan)
    }
  }
}
