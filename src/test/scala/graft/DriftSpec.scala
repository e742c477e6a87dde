package graft

import graft.operators.Drift

/** PSI drift monitor: brute-force ground truth on the sf0.001 corpus,
  * and the property that actually matters — injected distribution shift
  * raises PSI, identical halves drive it to ~0.
  */
class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("PSI matches brute-force recomputation on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect()
    val half = docs.map(_._1).max / 2
    def psi(bins: Seq[(String, Boolean)]): (Long, Long, Long, Double) = {
      val byBin = bins.groupBy(_._1)
      val nBins = byBin.size.toLong
      val nBase = bins.count(_._2).toLong
      val nNew = bins.size - nBase
      val s = byBin.values.map { ms =>
        val a = ms.count(_._2); val b = ms.size - a
        val pa = (a + 1).toDouble / (nBase + nBins)
        val pb = (b + 1).toDouble / (nNew + nBins)
        (pa - pb) * math.log(pa / pb)
      }.sum
      (nBins, nBase, nNew, s)
    }
    val expected = Map(
      "length" -> psi(docs.map(d => (((d._4 / 64) * 64).toString, d._1 <= half)).toSeq),
      "source" -> psi(docs.map(d => (d._2, d._1 <= half)).toSeq),
      "lang"   -> psi(docs.map(d => (d._3, d._1 <= half)).toSeq))
    val got = Drift.distributionDrift(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length === 3)
    got.foreach { case (dim, nBins, nBase, nNew, p) =>
      val (eB, eA, eN, eP) = expected(dim)
      assert((nBins, nBase, nNew) === ((eB, eA, eN)), dim)
      assert(math.abs(p - eP) < 1e-6, s"$dim psi $p vs $eP")
      // the generator's halves are id-random, so drift should be small
      assert(p < 0.25, s"$dim unexpectedly drifted: $p")
    }
  }

  test("injected shift raises PSI; identical halves stay at zero") {
    // a synthetic corpus whose second half flips the source mix hard
    val base = (0L until 200L).map(i => (i, if (i % 10 < 9) "web" else "books"))
    val drifted = (200L until 400L).map(i => (i, if (i % 10 < 2) "web" else "books"))
    val df = (base ++ drifted).map { case (id, src) =>
      (id, src, "en", 100L)
    }.toDF("doc_id", "source", "lang", "n_chars")
    val got = Drift.driftOf(df, 64)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    // the flipped source mix must trip the standard action threshold;
    // the untouched lang and length dimensions must read stable
    assert(got("source") > 0.25, s"hard mix flip: ${got("source")}")
    assert(math.abs(got("lang")) < 1e-9)
    assert(math.abs(got("length")) < 1e-9)
    // identical halves: smoothed shares equal → PSI exactly ~0
    val same = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "web" else "books", "en", 100L))
      .toDF("doc_id", "source", "lang", "n_chars")
    val psiSame = Drift.driftOf(same, 64)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => math.abs(r._5)).max
    assert(psiSame < 1e-9)
  }

  test("streaming monitor converges to the batch report bit-for-bit") {
    val batch = Drift.distributionDrift(spark, sf)
      .collect().map(_.toString).toSeq
    val streamed = graft.streaming.StreamingDrift.driftAvailableNow(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.size === 3)
  }
}
