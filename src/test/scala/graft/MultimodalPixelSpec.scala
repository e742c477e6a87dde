package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** The pixel-level image-dedup claims: the perceptual signature is over
  * DECODED pixels (not encoded bytes), so re-encodes of the same image —
  * a lossless PNG and a lossy JPEG — land in one near-dup cluster, which
  * no byte-level hash can do (their byte streams share nothing).
  */
class MultimodalPixelSpec extends SparkTestBase {
  import spark.implicits._

  private def phashOf(payloads: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    payloads.toDF("asset_id", "payload")
      .select(col("asset_id"),
        graft.functions.BlockHashExpr.blockHash63(
          udf((p: Array[Byte]) => Multimodal.decodeLumaGrid(p))
            .apply(col("payload"))).as("phash"))
      .as[(Long, Long)].collect().toMap

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("decoded luma grid replays the fixture formula exactly (PNG lossless)") {
    val id = 36L // group 3, member 0
    val grid = Multimodal.decodeLumaGrid(
      Multimodal.encodeImage(Multimodal.renderImage(id), "png"))
    assert(grid.length == Multimodal.GridW * Multimodal.GridH)
    for (y <- 0 until Multimodal.GridH; x <- 0 until Multimodal.GridW)
      assert((grid(y * Multimodal.GridW + x) & 0xff) == Multimodal.lumaAt(id, x),
        s"grid cell ($x,$y)")
  }

  test("group members sit at Hamming distance |m1-m2|, distinct groups far") {
    // group 1 = ids 12,15,18,21 (members 0..3); group 2 = ids 24..33
    val ids = Seq(12L, 15L, 18L, 21L, 24L)
    val ph = phashOf(ids.map(id =>
      id -> Multimodal.encodeImage(Multimodal.renderImage(id), "png")))
    assert(hamming(ph(12L), ph(15L)) == 1)
    assert(hamming(ph(12L), ph(21L)) == 3)
    assert(hamming(ph(15L), ph(21L)) == 2)
    assert(hamming(ph(12L), ph(24L)) > 3, "distinct groups must not collide")
  }

  test("a PNG and a JPEG encode of the same pixels land in one cluster") {
    val img = Multimodal.renderImage(48L) // group 4, member 0
    val near = Multimodal.renderImage(51L) // group 4, member 1
    val far = Multimodal.renderImage(120L) // group 10
    val payloads = Seq(
      1L -> Multimodal.encodeImage(img, "png"),
      2L -> Multimodal.encodeImage(img, "jpg"),
      3L -> Multimodal.encodeImage(near, "png"),
      4L -> Multimodal.encodeImage(far, "png"))
    val ph = phashOf(payloads)
    // the JPEG decode is approximate, but the flat-block structure keeps
    // the coarse signature within the near-dup budget
    assert(hamming(ph(1L), ph(2L)) <= 3,
      s"png/jpeg of identical pixels differ by ${hamming(ph(1L), ph(2L))} bits")
    val pairs = (for {
      Seq((a, ha), (b, hb)) <- ph.toSeq.sortBy(_._1).combinations(2)
      if hamming(ha, hb) <= 3
    } yield (a, b)).toSeq.toDF("doc_a", "doc_b")
    val clusters = Dedup.dupClustersFromPairs(spark, pairs)
      .as[(Long, Long, Long)].collect().map { case (id, c, _) => id -> c }.toMap
    assert(clusters.get(1L).isDefined && clusters(1L) == clusters(2L),
      "png and jpeg re-encode must share a cluster")
    assert(clusters(1L) == clusters(3L), "near member joins the cluster")
    assert(!clusters.get(4L).exists(_ == clusters(1L)),
      "distant group must not join")
  }

  test("pipeline signatures on the corpus: 4-member groups cluster together") {
    val cl = Multimodal.imageDupClusters(spark, sf, 3)
      .select("asset_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(cl.nonEmpty)
    val imgIds = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).select("doc_id")
      .as[Long].collect().toSet
    // every clustered asset's label is its group's min present id and the
    // cluster holds exactly the group's present members (the last group
    // at the corpus edge may be partial)
    cl.foreach { case (id, label, size) =>
      val groupIds = (0 to 3).map(m => (id / 12) * 12 + 3 * m).filter(imgIds)
      assert(label == groupIds.min, s"asset $id labeled $label")
      assert(size == groupIds.size.toLong, s"asset $id cluster_size $size")
    }
    // and every multi-member group is recovered
    val clustered = cl.map(_._1).toSet
    imgIds.groupBy(_ / 12).values.filter(_.size >= 2)
      .foreach(g => g.foreach(id =>
        assert(clustered.contains(id), s"asset $id missing from clusters")))
  }
}
