package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.sources.Tables

class ClusteringSpec extends SparkTestBase {

  /** Rows the parquet scan actually READ (post row-group skipping) for a
    * one-pass query. AQE off so the executed plan is directly walkable.
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  test("Z-clustered layout skips row groups the rectangle predicate excludes") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rect = (df: DataFrame) => df.where(
        col("l_shipdate").between(lit("1994-01-01"), lit("1994-06-30"))
          && col("l_partkey").between(1, 100))
      val plainRead = scanRows(rect(Tables.lineitem(spark, sf)))
      val clustRead = scanRows(rect(Clustering.clusteredLineitem(spark, sf)))
      val total = Tables.lineitem(spark, sf).count()
      // the unclustered corpus is written in orderkey order: shipdate and
      // partkey stats are wide per row group, nothing skips
      assert(plainRead == total,
        s"expected no skipping on the plain copy: read $plainRead of $total")
      assert(clustRead < total / 2,
        s"expected >50% of rows skipped on the Z-clustered copy: " +
          s"read $clustRead of $total (plain read $plainRead)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("both rectangle predicates are pushed to the clustered scan") {
    val q = Clustering.clusteredRectRevenue(spark, sf)
    val scan = q.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }
      .orElse(q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s })
    val pushed = scan.map(_.metadata("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_partkey"),
      s"expected both predicates pushed, got: $pushed")
  }

  test("clustered copy is lossless: rectangle query matches the plain table") {
    val clustered = Clustering.clusteredRectRevenue(spark, sf).collect().toSeq
    val plain = Clustering.rectRevenue(Tables.lineitem(spark, sf))
      .collect().toSeq
    assert(clustered == plain)
    assert(clustered.nonEmpty)
  }

  test("zValue interleaves bits (locality: nearby points share prefixes)") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3))
      .toDF("x", "y")
      .select(Clustering.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(0L, 1L, 2L, 3L, 4L, 8L, 15L))
  }
}
