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

  test("native DotProduct is bit-identical to the HOF dot, on float and double sides") {
    import graft.functions.CosineSimilarityExpr.dotNative
    val diff = pairs
      .select(dotNative(col("q_emb"), col("embedding")).as("native"),
        VectorFunctions.dot(col("q_emb"), col("embedding")).as("hof"))
      .where(col("native") =!= col("hof"))
      .count()
    assert(diff === 0L)
    // double × float mixed widths — the LSH plane projection's shape
    val mixed = Seq((Seq(0.5, -1.25, 2.0), Seq(2.0f, 4.0f, -1.0f)))
      .toDF("w", "v")
      .select(dotNative(col("w"), col("v")).as("d"),
        dotNative(col("v"), col("w")).as("d2"))
      .collect().head
    assert(mixed.getDouble(0) === 0.5 * 2.0 + -1.25 * 4.0 + 2.0 * -1.0)
    assert(mixed.getDouble(0) === mixed.getDouble(1))
    // length mismatch → NULL, like the HOF form's zip_with null-padding:
    // a common-prefix dot would hand a malformed row a REAL sign/bucket
    val mismatch = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(dotNative(col("a"), col("b")).as("d"),
        VectorFunctions.dot(col("a"), col("b")).as("hof"))
      .collect().head
    assert(mismatch.isNullAt(0))
    assert(mismatch.isNullAt(1), "HOF twin should also be null (parity)")
  }

  test("native cosine accepts a double-array side (centroid literals)") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 2.0))
    val got = Seq(Seq(3.0f, 4.0f)).toDF("v")
      .select(transform(typedlit(cents),
        c => cosineNative(col("v"), c)).as("s"))
      .as[Seq[Double]].head()
    assert(got === Seq(3.0 / 5.0, 4.0 / 5.0))
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

  test("a null ELEMENT yields NULL, matching the HOF twin (cosine and dot)") {
    import graft.functions.CosineSimilarityExpr.dotNative
    // an unguarded getFloat on a null slot reads stale UnsafeArrayData
    // bits — silent garbage, not an error — so the guard must null-poison
    // exactly like zip_with's null product does in the HOF form
    val rows = Seq(
      (Seq[java.lang.Float](1.0f, null, 2.0f), Seq[java.lang.Float](1.0f, 1.0f, 1.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f, 2.0f), Seq[java.lang.Float](1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
      .select(
        cosineNative(col("a"), col("b")).as("cos_n"),
        VectorFunctions.cosine(col("a"), col("b")).as("cos_h"),
        dotNative(col("a"), col("b")).as("dot_n"),
        VectorFunctions.dot(col("a"), col("b")).as("dot_h"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(2))
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(3), "HOF parity on null element")
    assert(!rows(1).isNullAt(0) && rows(1).getDouble(2) === 5.0)
    // LENGTH MISMATCH → NULL on cosine too (a truncated embedding must
    // never earn a common-prefix similarity the HOF twin NULLs)
    val mm = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(cosineNative(col("a"), col("b")).as("n"),
        VectorFunctions.cosine(col("a"), col("b")).as("h"))
      .collect().head
    assert(mm.isNullAt(0))
    assert(mm.isNullAt(1), "HOF twin should also be null (parity)")
    // interpreted eval path hits the same guard
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val withNull = Literal.create(Array[java.lang.Float](1.0f, null),
      ArrayType(FloatType, containsNull = true))
    assert(graft.functions.CosineSimilarity(withNull, withNull).eval(null) == null)
    assert(graft.functions.DotProduct(withNull, withNull).eval(null) == null)
  }

  test("two instances in one codegen scope compile (freshName'd locals)") {
    // force Janino compilation of a single projection holding TWO
    // CosineSimilarity instances: with fixed local names this throws
    // ("Redefinition of local variable") and Spark would silently fall
    // back to interpreted eval for the whole stage
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val t = ArrayType(FloatType, containsNull = false)
    val a = BoundReference(0, t, nullable = false)
    val b = BoundReference(1, t, nullable = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.CosineSimilarity(a, a),
      graft.functions.CosineSimilarity(a, b)))
    val row = InternalRow(
      ArrayData.toArrayData(Array(3.0f, 4.0f)),
      ArrayData.toArrayData(Array(4.0f, 3.0f)))
    val out = proj(row)
    assert(out.getDouble(0) === 1.0)
    assert(math.abs(out.getDouble(1) - 24.0 / 25.0) < 1e-15)
    // and through the DataFrame API: both columns in one projection
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
      .select(cosineNative(col("a"), col("b")).as("c1"),
        cosineNative(col("b"), col("a")).as("c2"))
    assert(df.collect().head.getDouble(0) === 0.0)
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
