package graft

import org.apache.spark.sql.functions._

import graft.functions.PolyHashExpr.polyHash

class PolyHashExprSpec extends SparkTestBase {
  import spark.implicits._

  test("native poly_hash is bit-identical to the HOF fold on corpus terms") {
    val terms = graft.operators.MaterializedIndex.postings(spark, sf)
      .select(col("term")).distinct()
    val diff = terms.select(
        polyHash(col("term")).as("native"),
        expr("aggregate(sequence(1, length(term)), 0L, " +
          "(acc, i) -> (acc * 31 + ascii(substr(term, i, 1))) % 1000000007)")
          .as("hof"))
      .where(col("native") =!= col("hof"))
      .count()
    assert(diff === 0L)
  }

  test("empty string, null, and interpreted eval") {
    val got = Seq(Some(""), Some("abc"), None).toDF("s")
      .select(polyHash(col("s"))).collect()
    assert(got(0).getLong(0) === 0L)
    assert(got(1).getLong(0) === (('a' * 31L + 'b') * 31 + 'c') % 1000000007L)
    assert(got(2).isNullAt(0))
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(graft.functions.PolyHash(Literal("abc")).eval(null)
      .asInstanceOf[Long] === (('a' * 31L + 'b') * 31 + 'c') % 1000000007L)
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
      graft.functions.PolyHash(a), graft.functions.PolyHash(b)))
    val row = proj(InternalRow(UTF8String.fromString("abc"),
      UTF8String.fromString("zz")))
    assert(row.getLong(0) === (('a' * 31L + 'b') * 31 + 'c') % 1000000007L)
    assert(row.getLong(1) === ('z' * 31L + 'z') % 1000000007L)
  }

  test("poly_hash is callable from SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT poly_hash('abc') AS h").head().getLong(0)
    assert(v === (('a' * 31L + 'b') * 31 + 'c') % 1000000007L)
  }
}
