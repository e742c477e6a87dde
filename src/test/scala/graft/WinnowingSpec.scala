package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The winnowing GUARANTEE (Schleimer et al. §2): any shared token run of
  * at least w + k − 1 tokens yields at least one shared selected
  * fingerprint — plus the density upper bound (one selection per window
  * start at most). Checked on a constructed corpus, not the synthetic
  * tables, so the property is exercised exactly at its boundary.
  */
class WinnowingSpec extends SparkTestBase {
  import spark.implicits._

  // k=4, w=5 → guarantee threshold is 8 shared tokens
  private val shared = "quick brown foxes jump over seven lazy dogs" // 8 tokens

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow_fix_")
    val docs = Seq(
      (0L, s"alpha beta gamma delta $shared epsilon zeta eta theta", "en", "s1", 1L),
      (1L, s"one two three four five six $shared", "en", "s2", 1L),
      (2L, "completely different content with no overlap at all here", "en", "s3", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("docs sharing a w+k-1 token run share a fingerprint; unrelated docs don't") {
    val sf = fixture()
    val pairs = TextAnalysis.winnowPairs(spark, sf, maxDf = 10, minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)),
      "the guaranteed shared fingerprint of the common 8-token run is missing")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "the unrelated doc produced a candidate pair")
  }

  test("selection density: at least one per full window, at most one per gram") {
    val sf = fixture()
    val stats = TextAnalysis.winnowing(spark, sf)
      .select(col("doc_id"), col("n_grams"), col("n_fingerprints"))
      .as[(Long, Int, Long)].collect()
    assert(stats.length == 3)
    stats.foreach { case (_, nGrams, nFp) =>
      val fullWindows = nGrams - 5 + 1
      assert(nFp >= math.ceil(fullWindows / 5.0).toLong,
        s"fewer selections ($nFp) than one per disjoint window of $fullWindows")
      assert(nFp <= fullWindows, s"more selections ($nFp) than window starts")
    }
  }
}
