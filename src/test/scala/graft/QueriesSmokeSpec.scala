package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

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

  test("every declared query name appears in SURVEY.md (the coverage contract)") {
    // the survey's §2 tables are what each round's audit checks line by
    // line — a query shipped without a row is invisible to the contract
    // (the r16 q_prefix_search lesson). Matched as WHOLE TOKENS, not raw
    // substring containment: q_funnel occurring only inside
    // q_curation_funnel must NOT count as a row for q_funnel.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    def hasToken(name: String): Boolean =
      ("(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(name) +
        "(?![A-Za-z0-9_])").r.findFirstIn(survey).isDefined
    val missing = SparkEntry.queries.keys.filterNot(hasToken).toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no SURVEY.md row: ${missing.mkString(", ")}")
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
      // Driver-sortability lint (the r13 q_label_centroids lesson): the
      // driver's pandas sort_values cannot order array/map/struct cells,
      // so a nested output column is an automatic driver failure no
      // matter how exact the math — declared queries must emit scalars.
      val nested = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${f.name}:${f.dataType.sql}"
      }
      assert(nested.isEmpty,
        s"$name emits nested columns ${nested.mkString(", ")} — the " +
          "driver's result sort cannot order them; emit scalar rows")
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
