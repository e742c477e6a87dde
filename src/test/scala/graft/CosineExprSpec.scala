package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarityExpr.cosineNative
import graft.functions.VectorFunctions

class CosineExprSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q)).where(col("vec_id") =!= col("qid"))
  }

  test("native CosineSimilarity is bit-identical to the higher-order-function form") {
    val diff = pairs
      .select(
        cosineNative(col("q_emb"), col("embedding")).as("native"),
        VectorFunctions.cosine(col("q_emb"), col("embedding")).as("hof"))
      .where(col("native") =!= col("hof"))     // bitwise double compare
      .count()
    assert(diff === 0L)
  }

  test("native expression handles nulls and interpreted (non-codegen) eval") {
    val withNull = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (None, Some(Seq(1.0f, 0.0f)))
    ).toDF("a", "b")
    val got = withNull.select(cosineNative(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 1.0)
    assert(got(1).isNullAt(0))
    // interpreted path (eval, not codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val l = Literal.create(Array(3.0f, 4.0f), ArrayType(FloatType))
    val expr = graft.functions.CosineSimilarity(l, l)
    assert(expr.eval(null).asInstanceOf[Double] === 1.0)
  }

  test("native vs HOF micro-benchmark (informational)") {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    pairs.select(sum(cosineNative(col("q_emb"), col("embedding")))).collect()
    pairs.select(sum(VectorFunctions.cosine(col("q_emb"), col("embedding")))).collect()
    val tNative = time(pairs.select(sum(cosineNative(col("q_emb"), col("embedding")))).collect())
    val tHof = time(pairs.select(sum(VectorFunctions.cosine(col("q_emb"), col("embedding")))).collect())
    info(f"native: $tNative%.3fs  hof: $tHof%.3fs  speedup: ${tHof / tNative}%.1fx")
    assert(tNative > 0 && tHof > 0)
  }
}
