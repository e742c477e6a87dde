package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.operators.IndexRewrite
import graft.plans.AggRewriteRule
import graft.sources.Tables

/** The index-aware rewrite must serve raw tokenize-and-count queries
  * from the postings parquet (never reading the text column), be
  * invisible (same answers as the un-rewritten plan), and veto on any
  * shape it cannot prove: a different tokenizer, or a per-row aggregate
  * with no explode at all.
  */
class IndexRewriteSpec extends SparkTestBase {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  private def withoutRule[T](body: => T): T = {
    val exp = spark.experimental
    val saved = exp.extraOptimizations
    exp.extraOptimizations = saved.filterNot(_ == AggRewriteRule)
    try body finally exp.extraOptimizations = saved
  }

  private lazy val indexPath: String = IndexRewrite.ensure(spark, sf)

  test("tokenize-and-count serves from the postings index, identically") {
    val df = IndexRewrite.topTermsServe(spark, sf)
    val paths = scanPaths(df)
    assert(paths.exists(_.contains(indexPath)), s"no index scan in $paths")
    assert(!paths.exists(_.contains("documents.parquet")),
      s"corpus scan survived the rewrite: $paths")
    val got = df.collect().toSeq
    val expected = withoutRule(
      IndexRewrite.topTermsServe(spark, sf).collect().toSeq)
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("a term filter + per-doc grouping serves from the index") {
    val df = IndexRewrite.termDocServe(spark, sf, "the")
    assert(scanPaths(df).exists(_.contains(indexPath)))
    val expected = withoutRule(
      IndexRewrite.termDocServe(spark, sf, "the").collect().toSeq)
    assert(df.collect().toSeq === expected)
    assert(expected.nonEmpty)
  }

  test("the rewritten term filter gains letter partition pruning") {
    val df = IndexRewrite.termDocServe(spark, sf, "the")
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val pf = scans.map(_.partitionFilters.mkString(" && ")).mkString("; ")
    assert(pf.contains("first_letter"),
      s"no letter partition filter on the rewritten scan: $pf")
  }

  test("a documents aggregate with no explode never matches the index") {
    indexPath
    val df = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(scanPaths(df).exists(_.contains("documents.parquet")))
  }

  test("a different tokenizer vetoes the rewrite") {
    indexPath
    val df = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    assert(scanPaths(df).exists(_.contains("documents.parquet")),
      "a foreign tokenizer must not be served from the index")
  }
}
