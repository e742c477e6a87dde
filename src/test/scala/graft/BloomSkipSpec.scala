package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomSkip, Clustering}

/** Per-file Bloom skipping: the RESULT must be bloom-invariant (no false
  * negatives) while the candidate file list actually shrinks — the part
  * the oracle cannot see.
  */
class BloomSkipSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom candidates cover the true files and skip most of the layout") {
    val layout = Clustering.ensureClustered(spark, sf)
    val trueFiles = spark.read.parquet(layout)
      .where(col("l_orderkey") === 42L)
      .select(input_file_name().as("f")).distinct()
      .as[String].collect().toSet
    assert(trueFiles.nonEmpty)
    val cand = BloomSkip.candidateFiles(spark, sf, 42L).toSet
    assert(trueFiles.subsetOf(cand), "bloom produced a FALSE NEGATIVE")
    val total = spark.read.parquet(layout)
      .select(input_file_name()).distinct().count()
    assert(cand.size < total,
      s"bloom skipped nothing: ${cand.size} of $total files kept")
  }

  test("bloomPrunedLookup == unpruned point lookup, nonempty") {
    val layout = Clustering.ensureClustered(spark, sf)
    val want = spark.read.parquet(layout)
      .where(col("l_orderkey") === 42L)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
      .as[(Long, Int, Long, Long, Double, Double)].collect().toSet
    val got = BloomSkip.bloomPrunedLookup(spark, sf, 42L)
      .as[(Long, Int, Long, Long, Double, Double)].collect().toSet
    assert(want.nonEmpty && got === want)
  }

  test("a key absent from the corpus returns nothing and prunes nearly everything") {
    assert(BloomSkip.bloomPrunedLookup(spark, sf, 987654321L).count() === 0L)
    val cand = BloomSkip.candidateFiles(spark, sf, 987654321L)
    // false-positive rate at these fill factors is well under 1 file
    assert(cand.size <= 2, s"absent key matched ${cand.size} files")
  }
}
