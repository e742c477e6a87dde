package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Scan
import graft.sources.Tables

class ScanSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed prefixSum == naive global-window cumsum") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tokens"))
    val distributed = Scan.prefixSum(toks, "doc_id", "n_tokens", "cum")
      .select("doc_id", "cum").as[(Long, Long)].collect().sorted
    val naive = toks
      .withColumn("cum", sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cum").as[(Long, Long)].collect().sorted
    assert(distributed.nonEmpty)
    assert(distributed === naive)
  }

  test("prefixSumBy (composite key) == naive cumsum over the same order") {
    // non-unique first key (n_chars collides), doc_id disambiguates —
    // exactly the (score, id) shape qualityDeciles ranks on
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"), lit(1L).as("one"))
    val distributed = Scan.prefixSumBy(docs,
        Seq(col("n_chars"), col("doc_id")), "one", "rnk")
      .select("doc_id", "rnk").as[(Long, Long)].collect().sorted
    val naive = docs
      .withColumn("rnk", sum(col("one")).over(
        Window.orderBy(col("n_chars"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "rnk").as[(Long, Long)].collect().sorted
    assert(distributed.nonEmpty)
    assert(distributed === naive)
  }

  test("prefixSum spreads work across multiple partitions (AQE coalescing off)") {
    // AQE legitimately coalesces this tiny dataset to one partition; turn
    // it off to observe the plan's inherent parallelism
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val toks = Tables.documents(spark, sf)
        .select(col("doc_id"), lit(1L).as("one"))
      val nParts = Scan.prefixSum(toks, "doc_id", "one", "cum")
        .rdd.getNumPartitions
      assert(nParts > 1, "prefix sum collapsed to a single partition")
    } finally spark.conf.set(key, prev)
  }
}
