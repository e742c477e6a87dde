package graft

import scala.collection.mutable

import graft.operators.NaiveBayes
import graft.sources.Tables

/** Brute-force validation of the distributed Naive Bayes build: the
  * model grid, quantized likelihoods, priors, and held-out argmax are
  * recomputed in plain Scala over the collected sf0.001 corpus and must
  * match the engine exactly (the statistics are integers and the
  * quantization is a deterministic function of them, so equality is
  * exact, not approximate). Note the spec pins MECHANICS, not accuracy —
  * the synthetic corpus draws all langs from a shared vocabulary, so the
  * classifier legitimately collapses toward the prior-dominant class.
  */
class NaiveBayesSpec extends SparkTestBase {

  private def tok(s: String): Seq[String] =
    s.toLowerCase.split(" ").toSeq.map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty)

  /** The Knuth 80/20 split rule (exact integer form of the oracle's). */
  private def isTrain(id: Long): Boolean =
    ((BigInt(id) * BigInt(2654435761L)) % BigInt(4294967296L)).toLong % 100 < 80

  /** round-half-away-from-zero at 0 dp — Spark's round() and DuckDB's. */
  private def q(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  // expected sufficient statistics over the train split
  private lazy val counts: Map[(String, String), Long] = {
    val m = mutable.Map.empty[(String, String), Long]
    docs.filter(d => isTrain(d._1)).foreach { case (_, lang, text) =>
      tok(text).foreach(t => m((lang, t)) = m.getOrElse((lang, t), 0L) + 1)
    }
    m.toMap
  }
  private lazy val langs: Set[String] = counts.keySet.map(_._1)
  private lazy val vocab: Set[String] = counts.keySet.map(_._2)
  private lazy val tot: Map[String, Long] =
    langs.map(l => l -> counts.collect { case ((`l`, _), n) => n }.sum).toMap
  private lazy val llq: Map[(String, String), Long] = (for {
    l <- langs; t <- vocab
  } yield (l, t) -> q(math.log(
    (counts.getOrElse((l, t), 0L) + 1.0) / (tot(l) + vocab.size)) * 1e6)).toMap

  test("nbTrain: full vocab × class grid, exact counts, quantized likelihoods") {
    val got = NaiveBayes.nbTrain(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size === vocab.size * langs.size)
    for (l <- langs; t <- vocab) {
      val n = counts.getOrElse((l, t), 0L)
      assert(got((l, t)) === ((n, llq((l, t)))), s"cell ($l, $t)")
    }
  }

  test("nbPredict: argmax matches brute-force scoring; every held-out doc appears once") {
    val trainDocs = docs.filter(d => isTrain(d._1))
    val nTrain = trainDocs.size
    val prior: Map[String, Long] = langs.map { l =>
      l -> q(math.log(
        trainDocs.count(_._2 == l).toDouble / nTrain) * 1e6)
    }.toMap
    val test = docs.filterNot(d => isTrain(d._1))
    val expected = test.map { case (id, actual, text) =>
      val k = tok(text).filter(vocab).groupBy(identity).map { case (t, g) => t -> g.size }
      val scores = langs.toSeq.map { l =>
        l -> (prior(l) + k.map { case (t, n) => n * llq((l, t)) }.sum)
      }
      val (cls, score) = scores.minBy { case (l, s) => (-s, l) }
      (id, (cls, actual, score))
    }.toMap
    val got = NaiveBayes.nbPredict(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getLong(3))))
    assert(got.length === test.size)
    assert(got.map(_._1).toSet === test.map(_._1).toSet)
    got.foreach { case (id, g) => assert(g === expected(id), s"doc $id") }
  }

  test("nbConfusion: cells sum to the held-out count") {
    val n = NaiveBayes.nbConfusion(spark, sf).collect().map(_.getLong(2)).sum
    assert(n === docs.count(d => !isTrain(d._1)))
  }

  test("nbAuc matches the brute-force pairwise AUC") {
    // independent definition: AUC = (#(pos>neg) + ½·#(pos==neg)) / (P·N)
    // over every positive/negative score pair — the rank-sum formulation
    // must agree exactly (up to the 6dp output rounding)
    val sc = NaiveBayes.scores(spark, sf)
      .select("cls", "actual", "score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = NaiveBayes.nbAuc(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toMap
    assert(got.nonEmpty)
    sc.groupBy(_._1).foreach { case (cls, rows) =>
      val pos = rows.filter(r => r._2 == cls).map(_._3)
      val neg = rows.filter(r => r._2 != cls).map(_._3)
      if (pos.nonEmpty && neg.nonEmpty) {
        val wins = (for (p <- pos; n <- neg)
          yield if (p > n) 2L else if (p == n) 1L else 0L).sum
        val expect = BigDecimal(wins.toDouble / (2.0 * pos.size * neg.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (gp, gn, gauc) = got(cls)
        assert((gp, gn) === ((pos.size.toLong, neg.size.toLong)), s"cls $cls")
        assert(gauc === expect, s"cls $cls")
      } else assert(!got.contains(cls))
    }
  }
}
