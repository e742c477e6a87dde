package graft

import org.apache.spark.sql.functions._

import graft.operators.ScanPushdown
import graft.sources.Tables

class ScanPushdownSpec extends SparkTestBase {

  test("footer stats: aggregation is pushed to the parquet scan") {
    val before = spark.conf.getOption("spark.sql.sources.useV1SourceList")
    val df = ScanPushdown.footerStatsProfile(spark, sf)
    // planning-window confs must not leak into the session
    assert(spark.conf.getOption("spark.sql.sources.useV1SourceList") === before)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [MIN(l_quantity), MAX(l_quantity), COUNT(*)]"),
      s"aggregate not pushed:\n${plan.take(2000)}")
    val row = df.collect().head
    val exp = Tables.lineitem(spark, sf)
      .agg(min("l_quantity"), max("l_quantity"), count(lit(1))).head()
    assert(row.getDouble(0) === exp.getDouble(0) &&
      row.getDouble(1) === exp.getDouble(1) &&
      row.getLong(2) === exp.getLong(2))
  }

  test("nested payload rollup: scan reads only the queried struct leaf") {
    val df = ScanPushdown.nestedPayloadRollup(spark, sf)
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ReadSchema"))
      .getOrElse(fail("no file scan in plan"))
    // the payload struct is pruned to the one queried leaf; meta and
    // event_id are not read at all
    assert(scanLine.contains("payload:struct<event_type:string>"),
      s"nested pruning missing: $scanLine")
    assert(!scanLine.contains("value") && !scanLine.contains("meta"),
      s"unqueried columns read: $scanLine")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exp)
  }
}
