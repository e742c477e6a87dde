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

  test("kmv_sketch/bottomk_sketch type mistakes resolve or fail at analysis") {
    GraftExtensions.register(spark)
    // INT input: ImplicitCastInputTypes inserts the loss-free cast to
    // BIGINT at analysis — before, this passed analysis and blew up at
    // execution with a ClassCastException inside update()
    val viaInt = spark.sql(
      """SELECT kmv_sketch(CAST(v AS INT), 4).kth_min AS m
        |FROM (VALUES (7), (3), (9), (1), (5)) t(v)""".stripMargin)
      .as[Long].head()
    assert(viaInt === 7L)
    // a STRING input gets ANSI's implicit string→bigint cast: a malformed
    // value now raises the proper CAST_INVALID_INPUT error (pointing at
    // the value and the cast), not an opaque executor ClassCastException
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(s, 4) FROM (VALUES ('x')) t(s)").collect()
    }
    assert(e.getMessage.contains("CAST_INVALID_INPUT"),
      s"expected a clean cast error, got ${e.getClass}: ${e.getMessage}")
    // a type with NO implicit cast to bigint fails AT ANALYSIS
    val e2 = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(array(1), 4) FROM (VALUES (1)) t(v)").collect()
    }
    assert(e2.isInstanceOf[org.apache.spark.sql.AnalysisException],
      s"expected AnalysisException, got ${e2.getClass}: ${e2.getMessage}")
    val hashes = spark.sql(
      """SELECT kmv_hashes(CAST(v AS INT), 3) AS h
        |FROM (VALUES (7), (3), (9), (1), (5)) t(v)""".stripMargin)
      .as[Seq[Long]].head()
    assert(hashes === Seq(1L, 3L, 5L))
    // bottomk_sketch: INT hash and DECIMAL value both implicit-cast
    val bk = spark.sql(
      """SELECT bottomk_sketch(CAST(v AS INT), CAST(v AS DECIMAL(4,1)), 2) AS b
        |FROM (VALUES (7), (3), (9)) t(v)""".stripMargin)
      .as[Seq[Double]].head()
    assert(bk === Seq(3.0, 7.0))
  }

  test("cosine_sim rejects non-float/double arrays at analysis time") {
    GraftExtensions.register(spark)
    // array(1.0) is array<decimal> — neither accepted element width
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0), array(1.0))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float|double>"))
    // a double-array side is now accepted (centroid-literal shape)
    val ok = spark.sql(
      """SELECT cosine_sim(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>)) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(ok === 0.6)
  }
}
