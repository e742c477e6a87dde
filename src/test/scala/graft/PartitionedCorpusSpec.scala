package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.operators.PartitionedCorpus
import graft.sources.Tables

class PartitionedCorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("dpp rollup: dynamic partition pruning fires on the fact scan") {
    // AQE off so the walked plan is the static one with the DPP subquery
    // visible (under AQE the pruning still runs but the plan nests)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = PartitionedCorpus.dppLangRollup(spark, sf, 300L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dpp rollup == direct rollup over the qualifying langs") {
    val got = PartitionedCorpus.dppLangRollup(spark, sf, 300L).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_chars"))).toSet
    val stats = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("c"), sum("n_chars").as("s")).collect()
    val expected = stats.filter(r => r.getAs[Long]("s") > r.getAs[Long]("c") * 300)
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("c"),
        r.getAs[Long]("s"))).toSet
    assert(got === expected)
    // the threshold must actually split the langs (else the test is vacuous)
    assert(expected.nonEmpty && expected.size < stats.length,
      s"threshold does not split: ${stats.mkString(",")}")
  }

  test("dynamic overwrite replaces only the partitions it writes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dyn_spec_")
    try {
      val v1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
        (4L, "b", 40L)).toDF("doc_id", "lang", "n_chars")
      v1.repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(dir.toString)
      def files(lang: String): Map[String, Array[Byte]] = {
        val d = dir.resolve(s"lang=$lang")
        val listed = java.nio.file.Files.list(d)
        try listed.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => p.getFileName.toString -> java.nio.file.Files.readAllBytes(p))
          .toMap
        finally listed.close()
      }
      val bBefore = files("b")
      assert(bBefore.nonEmpty)
      // overwrite ONLY lang=a (one row dropped) in dynamic mode
      v1.filter(col("lang") === "a" && col("doc_id") =!= 2L)
        .repartition(col("lang"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang").parquet(dir.toString)
      val bAfter = files("b")
      assert(bAfter.keySet === bBefore.keySet &&
        bAfter.forall { case (n, bytes) => bytes.sameElements(bBefore(n)) },
        "untouched partition was rewritten")
      val back = spark.read.parquet(dir.toString)
        .select("doc_id").as[Long].collect().toSet
      assert(back === Set(1L, 3L, 4L), s"merged read: $back")
    } finally graft.util.Scratch.deleteRecursively(dir)
  }

  test("runtime bloom filter: might_contain pruned plan, confs restored, values exact") {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val df = graft.operators.Relational.runtimeFilteredBrandQty(spark, sf)
    // planning-window confs must not leak into the session
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") === before)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in plan:\n${plan.take(2000)}")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))).toSet
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected && got.nonEmpty)
  }

  test("dynamicOverwriteReport: en gated, other langs untouched") {
    val got = PartitionedCorpus.dynamicOverwriteReport(spark, sf, 200L)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_chars"))).toSet
    val expected = Tables.documents(spark, sf)
      .filter(col("lang") =!= "en" || col("n_chars") >= 200)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_chars"))).toSet
    assert(got === expected)
  }
}
