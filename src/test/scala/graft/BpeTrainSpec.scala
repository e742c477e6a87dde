package graft

import graft.operators.TextAnalysis

/** BPE training on a corpus constructed so every merge is hand-checkable:
  * the most frequent pair must win round 1, the merged symbol must
  * immediately compete as a unit in round 2, and ties must break
  * lexicographically.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(texts: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_fix_")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("merges follow weighted pair counts and compose across rounds") {
    // "aaab" x3, "ab" x2: round 1 pairs — (a,a): 2 per aaab x3 = 6;
    // (a,b): 1 per aaab x3 + 1 per ab x2 = 5 → merge "a a" -> "aa".
    // round 2 symbols: aaab = [aa, a, b], ab = [a, b] → (aa,a): 3,
    // (a,b): 2+3? no — aaab is now aa|a|b so (aa,a)=3 and (a,b)=3+2=5
    // → "a b" -> "ab" wins round 2 (5 > 3).
    val sf = corpus("aaab aaab aaab ab ab")
    val merges = TextAnalysis.bpeTrain(spark, sf, rounds = 2)
      .select("round", "merged_pair", "pair_count")
      .as[(Int, String, Long)].collect().toList
    assert(merges == List((1, "a a", 6L), (2, "a b", 5L)), merges.toString)
  }

  test("equal counts break ties lexicographically") {
    // "xy" x2 and "zw" x2 both have count 2 → "x y" < "z w" wins
    val sf = corpus("xy xy zw zw")
    val first = TextAnalysis.bpeTrain(spark, sf, rounds = 1)
      .select("merged_pair").as[String].head()
    assert(first == "x y")
  }
}
