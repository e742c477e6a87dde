package graft

import org.apache.spark.sql.functions._

import graft.functions.HammingDistanceExpr.hammingNative

/** The native hamming_distance expression is pinned against the HOF
  * fold it replaced — exact integer arithmetic, so EQUALITY, not
  * approximation — across random word arrays, both codegen and
  * interpreted eval modes, and null/length edges.
  */
class HammingDistanceExprSpec extends SparkTestBase {
  import spark.implicits._

  private def hofReference(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum

  test("matches the HOF fold on random packed words") {
    val rnd = new scala.util.Random(3)
    val data = Seq.fill(50)((Seq.fill(4)(rnd.nextLong()), Seq.fill(4)(rnd.nextLong()))) ++
      Seq((Seq(0L), Seq(-1L)), (Seq.empty[Long], Seq.empty[Long]),
        (Seq(Long.MaxValue, Long.MinValue), Seq(0L, 0L)))
    val got = data.toDF("a", "b")
      .select(hammingNative(col("a"), col("b")).as("h"),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("hof"))
      .as[(Long, Long)].collect()
    data.zip(got).foreach { case ((a, b), (h, hof)) =>
      assert(h === hofReference(a, b), s"native vs scala on $a / $b")
      assert(h === hof, s"native vs HOF on $a / $b")
    }
  }

  test("interpreted eval == codegen") {
    val df = Seq((Seq(7L, -9L, 123456789L), Seq(-7L, 9L, 987654321L)))
      .toDF("a", "b").select(hammingNative(col("a"), col("b")).as("h"))
    val on = df.as[Long].head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.as[Long].head() === on)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null array yields null; non-bigint arrays fail analysis") {
    val got = Seq((1L, Some(Seq(1L)), None: Option[Seq[Long]]))
      .toDF("id", "a", "b")
      .select(hammingNative(col("a"), col("b")).as("h"))
      .collect().head
    assert(got.isNullAt(0))
    // a null ELEMENT also yields NULL — the HOF fold's bit_count(null)
    // poisons its sum the same way; an unguarded read would be garbage
    val elemNull = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
      .select(hammingNative(col("a"), col("b")).as("h"))
      .collect().head
    assert(elemNull.isNullAt(0))
    val e = intercept[Exception] {
      Seq((Seq(1), Seq(2))).toDF("a", "b")
        .select(hammingNative(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"))
  }
}
