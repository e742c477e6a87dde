package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine_sim is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    val unit = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .as[Double].head()
    assert(unit === 1.0)

    graft.sources.Tables.embeddings(spark, sf)
      .createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS ia, b.vec_id AS ib,
        |       cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_ext a JOIN emb_ext b ON a.vec_id < b.vec_id
        |ORDER BY ia, ib LIMIT 100""".stripMargin)
      .as[(Long, Long, Double)].collect()
    val viaCol = {
      val e = graft.sources.Tables.embeddings(spark, sf)
      val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      a.join(b, col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          VectorFunctions.cosine(col("ea"), col("eb")).as("c"))
        .orderBy("ia", "ib").limit(100)
        .as[(Long, Long, Double)].collect()
    }
    assert(viaSql.sameElements(viaCol))
  }

  test("cosine_sim rejects non-float arrays at analysis time") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0), array(1.0))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}
