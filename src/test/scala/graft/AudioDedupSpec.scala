package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The audio near-dup claims: the signature is over DECODED samples (a
  * real RIFF→javax.sound round trip), group geometry is recovered
  * exactly, and the banding loses nothing against brute force.
  */
class AudioDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def blockHashRef(bytes: Array[Byte]): Long = {
    val acc = new Array[Long](63)
    var total = 0L
    bytes.zipWithIndex.foreach { case (b, i) =>
      val v = (b & 0xff).toLong
      acc(i % 63) += v; total += v
    }
    (0 until 63).map(j => if (acc(j) * 63 > total) 1L << j else 0L).sum
  }

  test("decoded energy profile replays the fixture formula exactly") {
    val id = 13L // group 1, member 0
    val sig = Multimodal.decodeAudioSig(Multimodal.renderWav(id))
    assert(sig.length == Multimodal.AudioFrames)
    (0 until Multimodal.AudioFrames).foreach { j =>
      assert((sig(j) & 0xff) == (Multimodal.ampAt(id, j) >> 7), s"frame $j")
    }
  }

  test("a resampled re-encode of the same signal lands at Hamming 0") {
    // same per-frame amplitudes, DIFFERENT sample count and rate — the
    // frame-banded profile is invariant to the container geometry
    val id = 25L
    val n = Multimodal.AudioFrames * 64 // half the fixture sample count
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(4000).putInt(8000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    (0 until n).foreach { i =>
      val a = Multimodal.ampAt(id, i / 64)
      bb.putShort((if ((i & 1) == 0) a else -a).toShort)
    }
    val orig = blockHashRef(Multimodal.decodeAudioSig(Multimodal.renderWav(id)))
    val resamp = blockHashRef(Multimodal.decodeAudioSig(bb.array()))
    assert(orig == resamp, "resampled encode must produce the same signature")
  }

  test("banded candidate join + verify ≡ brute-force pairs (total recall)") {
    val sigs = Multimodal.audioSig(spark, sf)
      .as[(Long, Long)].collect()
    assert(sigs.nonEmpty)
    val brute = (for {
      Seq((a, ha), (b, hb)) <- sigs.toSeq.sortBy(_._1).combinations(2)
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b, d)).toSet
    val banded = Multimodal.audioNearDupPairs(spark, sf, 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
  }

  test("4-member groups cluster exactly; keeper is the min present id") {
    val cl = Multimodal.audioDupClusters(spark, sf, 3)
      .select("asset_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(cl.nonEmpty)
    val audIds = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1).select("doc_id")
      .as[Long].collect().toSet
    cl.foreach { case (id, label, size) =>
      val groupIds = (0 to 3).map(m => (id / 12) * 12 + 3 * m + 1).filter(audIds)
      assert(label == groupIds.min, s"asset $id labeled $label")
      assert(size == groupIds.size.toLong, s"asset $id cluster_size $size")
    }
    val clustered = cl.map(_._1).toSet
    audIds.groupBy(_ / 12).values.filter(_.size >= 2)
      .foreach(_.foreach(id =>
        assert(clustered.contains(id), s"asset $id missing from clusters")))
  }
}
