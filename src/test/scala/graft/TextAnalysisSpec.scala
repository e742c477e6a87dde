package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Semantics of the corpus-analysis operators that feed curation:
  * the bigram LM's probabilities and the boilerplate-shingle ratio.
  */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("bigramLm: p is the conditional c(w1 w2)/c(w1 ·), counts consistent") {
    val rows = TextAnalysis.bigramLm(spark, sf, 20)
      .as[(String, String, Long, Double)].collect()
    assert(rows.length === 20)
    // recompute the w1 marginals from the FULL bigram relation (not just
    // the returned top-k) and check each returned p against it
    val allGrams = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("ts"))
      .select(explode(
        graft.functions.TextFunctions.shinglesOfTokens(col("ts"), 2)).as("g"))
      .as[String].collect()
    val pairCount = allGrams.groupBy(identity).view.mapValues(_.length.toLong)
    val w1Count = allGrams.map(_.split(" ")(0))
      .groupBy(identity).view.mapValues(_.length.toLong)
    rows.foreach { case (w1, w2, n, p) =>
      assert(n === pairCount(s"$w1 $w2"))
      assert(p === n.toDouble / w1Count(w1).toDouble)
      assert(p > 0 && p <= 1)
    }
    // top-k really is the k most frequent bigrams
    val kthN = rows.map(_._3).min
    val above = pairCount.values.count(_ > kthN)
    assert(above <= 20)
  }

  test("bpePairCounts equals a driver-side recount of weighted char pairs") {
    val rows = TextAnalysis.bpePairCounts(spark, sf, 20)
      .as[(String, Long)].collect()
    assert(rows.length === 20)
    val termCounts = graft.sources.Tables.documents(spark, sf)
      .select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .as[String].collect()
      .groupBy(identity).view.mapValues(_.length.toLong)
    val pairCounts = termCounts.toSeq
      .flatMap { case (t, c) => t.sliding(2).filter(_.length == 2).map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    rows.foreach { case (p, n) => assert(n === pairCounts(p)) }
    assert(rows.map(_._2).sliding(2).forall(s => s.head >= s.last))
  }

  test("quality deciles: bucket sizes within one of n/10, bounds monotone") {
    val rows = TextAnalysis.qualityDeciles(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === (1 to 10))
    val total = rows.map(_._2).sum
    // floor((rank-1)*10/n) buckets differ in size by at most 1
    rows.foreach { case (_, n, lo, hi) =>
      assert(math.abs(n - total / 10.0) <= 1.0)
      assert(lo <= hi)
    }
    // decile bounds are non-decreasing across buckets
    rows.sliding(2).foreach { case Array((_, _, _, hi1), (_, _, lo2, _)) =>
      assert(hi1 <= lo2)
    }
  }

  test("boilerplate: ratio bounded, counts consistent, threshold bites") {
    val rows = TextAnalysis.boilerplateRatio(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSh, nBoiler, ratio) =>
      assert(nBoiler >= 0 && nBoiler <= nSh)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // non-degenerate both ways: some docs contain common shingles, and
    // the threshold excludes some (not every shingle is "boilerplate")
    assert(rows.exists(_._3 > 0), "no doc has any corpus-common shingle")
    assert(rows.exists(r => r._3 < r._2),
      "every shingle counted as boilerplate — threshold not biting")
  }

  test("mixture cube: grouping sets tile — grand total equals corpus count") {
    val rows = TextAnalysis.mixtureCube(spark, sf).collect()
    val total = graft.sources.Tables.documents(spark, sf).count()
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.getAs[Long]("n_docs") == total)
    // each grouping level partitions the corpus
    Seq(0L, 1L, 2L).foreach { gid =>
      val level = rows.filter(_.getAs[Long]("gid") == gid)
      assert(level.map(_.getAs[Long]("n_docs")).sum == total,
        s"grouping level $gid does not tile the corpus")
    }
  }

  test("pmi: marginals are positional sums over ALL pairs; pmi = ln(n12·N/(n1·n2))") {
    val rows = graft.operators.TextAnalysis.pmiCollocations(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // recompute the bigram relation brute-force on the driver
    val grams = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("ts"))
      .as[Seq[String]].collect()
      .flatMap(ts => ts.zip(ts.drop(1)))
    val n12 = grams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n1 = grams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val n2 = grams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val nn = grams.length.toLong
    // the report is exactly the n12 >= 10 slice
    assert(rows.length === n12.count(_._2 >= 10L))
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("n12") === n12((w1, w2)))
      assert(r.getAs[Long]("n12") >= 10L)
      assert(r.getAs[Long]("n1") === n1(w1), s"marginal n1($w1)")
      assert(r.getAs[Long]("n2") === n2(w2), s"marginal n2($w2)")
      val want = BigDecimal(math.log(
        n12((w1, w2)).toDouble * nn / (n1(w1).toDouble * n2(w2))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("pmi") - want) < 1e-9, s"pmi($w1 $w2)")
    }
  }
}
