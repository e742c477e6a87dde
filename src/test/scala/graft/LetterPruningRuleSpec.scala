package graft

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.operators.Indexer
import graft.plans.LetterPruningRule

/** The optimizer rule must turn a bare `term = 'lit'` filter over the
  * letter-partitioned index into REAL partition pruning (directories
  * never listed), without the caller mentioning first_letter — and must
  * not fire where it has nothing sound to say.
  */
class LetterPruningRuleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val indexPath: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_rule_prune").toString
    Indexer.writeIndex(spark, sf, out)
    out
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LetterPruningRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == LetterPruningRule)
  }

  private def partitionFilters(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.partitionFilters.map(_.sql)
    }.flatten

  test("term equality gains a first_letter partition filter and prunes") {
    val (rows, pf) = withRule {
      val q = spark.read.parquet(indexPath).filter($"term" === "the")
      (q.collect(), partitionFilters(q))
    }
    assert(pf.exists(_.contains("first_letter")), s"no injected pruning: $pf")
    // identical answer to the un-pruned read
    val plain = spark.read.parquet(indexPath).filter($"term" === "the").collect()
    assert(rows.sortBy(_.getLong(2)).sameElements(plain.sortBy(_.getLong(2))))
    assert(rows.nonEmpty)
  }

  test("IN-list terms prune to the union of their letters") {
    val pf = withRule {
      partitionFilters(spark.read.parquet(indexPath)
        .filter($"term".isin("scan", "join", "filter")))
    }
    assert(pf.exists(p => p.contains("first_letter") &&
      p.contains("s") && p.contains("j") && p.contains("f")), pf.toString)
  }

  test("the rule stays silent without a term equality or off the index schema") {
    val pfDoc = withRule {
      partitionFilters(spark.read.parquet(indexPath).filter($"doc_id" === 3))
    }
    assert(!pfDoc.exists(_.contains("first_letter")), pfDoc.toString)
    // a non-index relation with a term column must be untouched
    val df = withRule {
      Seq(("x", 1L)).toDF("term", "n").filter($"term" === "x")
    }
    assert(df.collect().map(_.getLong(1)).sameElements(Array(1L)))
  }

  test("an existing first_letter predicate is left alone (idempotence)") {
    val pf = withRule {
      partitionFilters(spark.read.parquet(indexPath)
        .filter($"first_letter" === "t" && $"term" === "the"))
    }
    // exactly the caller's predicate — the rule adds nothing on top
    assert(pf.nonEmpty && pf.forall(_.contains("first_letter")))
  }
}
