package graft

import org.apache.spark.sql.functions._

import graft.functions.PairProductsExpr.pairProducts

/** The native pair_products expression is pinned against the HOF form it
  * replaced (flatten∘transform∘struct) — same products, same row-major
  * upper-triangle enumeration — plus the dense-position↔(i,j) round trip
  * the covariance grid's mapping join relies on.
  */
class PairProductsExprSpec extends SparkTestBase {
  import spark.implicits._

  private def hofReference(qs: Seq[Option[Long]]): Seq[Option[Long]] =
    for {
      i <- qs.indices
      j <- i until qs.size
    } yield for { a <- qs(i); b <- qs(j) } yield a * b

  test("matches the HOF reference on dense arrays (codegen fast path)") {
    val data = Seq(
      Seq(3L, -1L, 4L, 1L, -5L, 9L),
      Seq(0L, 0L),
      Seq(7L),
      Seq.empty[Long],
      Seq(1000000L, -2000000L, 123456L))
    val got = data.toDF("q")
      .select(pairProducts(col("q")).as("p"))
      .as[Seq[Option[Long]]].collect()
    data.zip(got).foreach { case (qs, g) =>
      assert(g === hofReference(qs.map(Some(_))), s"input $qs")
    }
  }

  test("null array yields null; null elements yield null products") {
    val df = Seq(
      (1L, Some(Seq(Some(2L), None, Some(3L)))),
      (2L, None: Option[Seq[Option[Long]]]))
      .toDF("id", "q")
    val got = df.select(col("id"), pairProducts(col("q")).as("p"))
      .as[(Long, Option[Seq[Option[Long]]])].collect().toMap
    assert(got(2L).isEmpty)
    assert(got(1L).get === hofReference(Seq(Some(2L), None, Some(3L))))
  }

  test("d(d+1)/2 past Int.MaxValue fails FAST, not with a wrapped allocation") {
    // at d = 65536 the Int product d*(d+1) wraps; the Long-typed triangle
    // size must instead reject the row loudly (a JVM array cannot hold
    // the triangle anyway — the failure mode to prevent is silent
    // corruption via a negative/short allocation)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val big = Literal.create(Array.fill(65536)(1L), ArrayType(LongType, false))
    val e = intercept[IllegalArgumentException] {
      graft.functions.PairProducts(big).eval(null)
    }
    assert(e.getMessage.contains("triangle size"))
  }

  test("interpreted eval == codegen (both fast and boxed paths)") {
    // force interpreted eval through a filter context that disables
    // codegen: compare collect() of the same projection with codegen
    // toggled via conf
    val data = Seq(Seq(Some(5L), Some(-7L), Some(11L)),
      Seq(Some(1L), None, Some(2L)))
    val df = data.toDF("q").select(pairProducts(col("q")).as("p"))
    val on = df.as[Seq[Option[Long]]].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = df.as[Seq[Option[Long]]].collect()
      assert(on.toSeq === off.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("dense position inverts to (i,j) via the covariance mapping formula") {
    val d = 6
    // the formula covarianceGrid's mapping join uses
    val mapping = (0 until d).flatMap(i => (i until d).map(j =>
      (i.toLong * (2L * d - i + 1) / 2 + (j - i)).toInt -> ((i, j))))
    assert(mapping.map(_._1) === (0 until d * (d + 1) / 2))
    // and it agrees with the expression's enumeration order
    val q = (1 to d).map(_.toLong * 10)
    val got = Seq(q).toDF("q").select(pairProducts(col("q")).as("p"))
      .as[Seq[Long]].head()
    mapping.foreach { case (k, (i, j)) =>
      assert(got(k) === q(i) * q(j), s"position $k should be q[$i]*q[$j]")
    }
  }

  test("the covariance pair stage runs inside WholeStageCodegen") {
    // the whole point of the native expression: the n·d(d+1)/2-row hot
    // stage must be a codegen'd loop, not interpreted eval — GenerateExec
    // supports codegen for explode-family generators, so the projection
    // holding pair_products has to land inside a WholeStageCodegen span
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the declared query serves from the memoized moment artifact, so
      // the hot stage to probe is the artifact BUILD plan itself
      val plan = graft.operators.Covariance.pairCells(
          graft.operators.Covariance.quantized(
            graft.sources.Tables.embeddings(spark, sf)))
        .queryExecution.executedPlan
      val inCodegen = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.exists(_.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.exists(_.generator.exists(_.isInstanceOf[graft.functions.PairProducts])))
      assert(inCodegen, s"pair_products not inside WholeStageCodegen:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("rejects a non-bigint array at analysis time") {
    val e = intercept[Exception] {
      Seq(Seq(1, 2)).toDF("q").select(pairProducts(col("q"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"))
  }
}
