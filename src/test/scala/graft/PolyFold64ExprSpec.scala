package graft

import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

class PolyFold64ExprSpec extends SparkTestBase {
  import spark.implicits._

  test("native poly_fold64 ≡ HOF fold ≡ driver-side literal on corpus vocab") {
    val terms = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .distinct()
    val rows = terms.select(col("term"),
        HashFunctions.polyFold64(col("term")).as("native"),
        HashFunctions.polyFold64Hof(col("term")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, native, hof) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(native == hof, s"native != HOF for '$t'")
      assert(native == HashFunctions.polyFold64Lit(t), s"native != literal for '$t'")
    }
  }

  test("empty string, null, and interpreted eval") {
    val got = Seq(Some(""), Some("ab"), None).toDF("s")
      .select(HashFunctions.polyFold64(col("s"))).collect()
    assert(got(0).getLong(0) === 0L)
    assert(got(1).getLong(0) === HashFunctions.polyFold64Lit("ab"))
    assert(got(2).isNullAt(0))
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(graft.functions.PolyFold64(Literal("ab")).eval(null)
      .asInstanceOf[Long] === HashFunctions.polyFold64Lit("ab"))
  }

  test("property: native eval == driver literal fold for arbitrary ASCII strings") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import org.apache.spark.sql.catalyst.expressions.Literal
    // printable ASCII incl. spaces/punctuation — the fold is defined on
    // bytes; ASCII is where byte==code point (the engine-exact contract)
    val asciiGen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val prop = Prop.forAll(asciiGen) { s =>
      graft.functions.PolyFold64(Literal(s)).eval(null)
        .asInstanceOf[Long] == graft.functions.HashFunctions.polyFold64Lit(s)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("two instances in one codegen scope compile (freshName'd locals)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val a = BoundReference(0, StringType, nullable = false)
    val b = BoundReference(1, StringType, nullable = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.PolyFold64(a), graft.functions.PolyFold64(b)))
    val row = proj(InternalRow(UTF8String.fromString("abc"),
      UTF8String.fromString("zz")))
    assert(row.getLong(0) === HashFunctions.polyFold64Lit("abc"))
    assert(row.getLong(1) === HashFunctions.polyFold64Lit("zz"))
  }
}
