package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class BlockHashSpec extends SparkTestBase {
  import spark.implicits._

  /** The definition, independently: 63 block sums over unsigned bytes,
    * bit j iff 63·blocksum_j > totalsum.
    */
  private def blockHashRef(bytes: Array[Byte]): Long = {
    val acc = new Array[Long](63)
    var total = 0L
    bytes.zipWithIndex.foreach { case (b, i) =>
      val v = (b & 0xff).toLong
      acc(i % 63) += v; total += v
    }
    (0 until 63).map(j => if (acc(j) * 63 > total) 1L << j else 0L).sum
  }

  test("native block_hash63 ≡ driver-side recompute on decoded luma grids") {
    val rows = Multimodal.imagePhash(spark, sf)
      .join(spark.read.parquet(Multimodal.ensureLumaGrid(spark, sf)),
        "asset_id")
      .select("asset_id", "phash", "luma")
      .as[(Long, Long, Array[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, got, luma) =>
      assert(luma.length == Multimodal.GridW * Multimodal.GridH, s"asset $id")
      assert(got == blockHashRef(luma), s"asset $id")
      assert(got >= 0L, s"asset $id: 63-bit signature must be non-negative")
    }
  }

  test("empty payload, null, and interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val got = Seq(Some(Array.emptyByteArray), Some("abc".getBytes("UTF-8")), None)
      .toDF("p").select(graft.functions.BlockHashExpr.blockHash63(col("p")))
      .collect()
    assert(got(0).getLong(0) === 0L)
    assert(got(1).getLong(0) === blockHashRef("abc".getBytes("UTF-8")))
    assert(got(2).isNullAt(0))
    assert(graft.functions.BlockHash63(
        Literal("abc".getBytes("UTF-8"), BinaryType)).eval(null)
      .asInstanceOf[Long] === blockHashRef("abc".getBytes("UTF-8")))
  }

  test("property: native eval == reference for arbitrary byte arrays") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val prop = Prop.forAll(bytesGen) { bs =>
      graft.functions.BlockHash63(Literal(bs, BinaryType)).eval(null)
        .asInstanceOf[Long] == blockHashRef(bs)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("banded candidate join + verify ≡ brute-force pairs (total recall)") {
    val sig = Multimodal.imagePhash(spark, sf)
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- sig; (b, hb) <- sig if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = Multimodal.imageNearDupPairs(spark, sf, 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("imageDupClusters labels components of the brute-force pair graph") {
    val sig = Multimodal.imagePhash(spark, sf).as[(Long, Long)].collect()
    val edges = (for {
      (a, ha) <- sig; (b, hb) <- sig
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSeq
    // driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comp = verts.map(v => v -> find(v)).toMap
    val sizes = comp.groupBy(_._2).map { case (l, vs) => l -> vs.size.toLong }
    val expected = verts.map(v =>
      (v, comp(v), sizes(comp(v)), v == comp(v))).sortBy(_._1).toSeq
    val got = Multimodal.imageDupClusters(spark, sf, 3)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expected)
  }

  test("two instances in one codegen scope compile (freshName'd locals)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.BinaryType
    val a = BoundReference(0, BinaryType, nullable = false)
    val b = BoundReference(1, BinaryType, nullable = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.functions.BlockHash63(a), graft.functions.BlockHash63(b)))
    val row = proj(InternalRow("abc".getBytes("UTF-8"), "zz".getBytes("UTF-8")))
    assert(row.getLong(0) === blockHashRef("abc".getBytes("UTF-8")))
    assert(row.getLong(1) === blockHashRef("zz".getBytes("UTF-8")))
  }
}
