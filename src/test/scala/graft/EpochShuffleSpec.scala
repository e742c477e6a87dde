package graft

import graft.operators.Sampling

/** Deterministic epoch shuffle: the checksum/first-doc report must match
  * a brute-force local permutation, distinct epochs must decorrelate,
  * and repeated runs must be bit-stable (the retry guarantee).
  */
class EpochShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(ids: Seq[Long], epoch: Int): (Long, Long) = {
    val perm = ids.sortBy { id =>
      val h = ((BigInt(id) * BigInt(2654435761L) + epoch * 40503) %
        BigInt(4294967296L)) * BigInt(2654435761L) % BigInt(4294967296L)
      (h, id)
    }
    val checksum = perm.zipWithIndex.map { case (id, i) =>
      BigInt(id + 1) * (i + 1)
    }.sum % 1000000007L
    (checksum.toLong, perm.head)
  }

  test("report matches brute-force permutation; epochs decorrelate") {
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().toSeq
    val rows = Sampling.epochShuffle(spark, sf, 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 2)
    rows.foreach { case (epoch, n, checksum, firstDoc) =>
      assert(n === ids.size)
      val (eChk, eFirst) = bruteForce(ids, epoch.toInt)
      assert(checksum === eChk, s"epoch $epoch checksum")
      assert(firstDoc === eFirst, s"epoch $epoch first doc")
    }
    // distinct epochs must yield distinct permutations
    assert(rows(0)._3 !== rows(1)._3)
  }

  test("bit-stable across runs (the retry/resume guarantee)") {
    val a = Sampling.epochShuffle(spark, sf, 2).collect().map(_.toString)
    val b = Sampling.epochShuffle(spark, sf, 2).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
