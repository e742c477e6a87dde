package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  private def trueCounts: Map[String, Long] =
    graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.explodedTokens(col("text")).as("term"))
      .groupBy("term").count()
      .as[(String, Long)].collect().toMap

  test("k above the vocabulary size: sketch is exact") {
    val exact = trueCounts
    val got = TextAnalysis.heavyHitters(spark, sf, 64)
      .as[(String, Long)].collect().toMap
    assert(got === exact)
  }

  test("small k: estimates under-count by at most N/(k+1), hitters survive") {
    val exact = trueCounts
    val n = exact.values.sum
    val k = 4
    val slack = n / (k + 1)
    val got = TextAnalysis.heavyHitters(spark, sf, k)
      .as[(String, Long)].collect().toMap
    assert(got.size <= k)
    got.foreach { case (t, est) =>
      val truth = exact(t)
      assert(est <= truth, s"$t overestimated: $est > $truth")
      assert(est >= truth - slack, s"$t below the MG bound")
    }
    // every term more frequent than N/(k+1) must be reported
    exact.filter(_._2 > slack).keys.foreach { t =>
      assert(got.contains(t), s"heavy hitter $t missing from the sketch")
    }
  }
}
