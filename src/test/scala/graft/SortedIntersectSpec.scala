package graft

import org.apache.spark.sql.functions._

import graft.functions.SortedIntersectExpr

/** The native merge-walk intersect expressions must be value-identical to
  * the generic `array_intersect` they replaced in the triangle count and
  * the packed-set verifies — for sorted distinct inputs (the call-site
  * contract) AND for the collision-duplicated inputs the dup-skip guard
  * covers.
  */
class SortedIntersectSpec extends SparkTestBase {
  import spark.implicits._

  private def ref(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    a.distinct.filter(b.contains) // array_intersect: left order, deduped

  private val cases: Seq[(Seq[Long], Seq[Long])] = {
    val rnd = new scala.util.Random(7)
    val random = (0 until 50).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    random ++ Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(Long.MinValue, -5L, 0L, 7L, Long.MaxValue),
        Seq(Long.MinValue, -5L, 1L, 7L, Long.MaxValue)),
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(1L, 2L, 2L, 4L)), // dup-skip guard
      (Seq(5L), Seq(5L)))
  }

  test("sortedIntersect == array_intersect on sorted inputs (codegen path)") {
    val df = cases.toDF("a", "b")
    val rows = df.select(
      SortedIntersectExpr.sortedIntersect(col("a"), col("b")).as("got"),
      array_intersect(col("a"), col("b")).as("want"),
      SortedIntersectExpr.sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getInt(2) === r.getSeq[Long](1).length)
    }
  }

  test("interpreted eval matches the reference semantics") {
    cases.foreach { case (a, b) =>
      val expA = graft.functions.SortedLongIntersect(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          a, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          b, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))
      val got = expA.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(got === ref(a, b), s"a=$a b=$b")
    }
  }

  test("null arrays propagate null") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
    val r = df.select(
      SortedIntersectExpr.sortedIntersect(col("a"), col("b")),
      SortedIntersectExpr.sortedIntersectCount(col("a"), col("b"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
