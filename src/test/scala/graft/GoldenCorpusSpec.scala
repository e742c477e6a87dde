package graft

import org.apache.spark.sql.functions._

import graft.sources.TextCorpus

/** End-to-end golden test on the reference engine's REAL corpus
  * (`/root/reference/data/` — Shakespeare + Tolstoy + Hugo, ~14.5 MB,
  * 48 visible files; the two hidden .DS_Store junk files are skipped by
  * Spark's hidden-file filter, matching a sane ingest).
  *
  * Expected values were computed independently with the reference's own
  * shell pipeline (`/root/reference/helper_map.c:166` +
  * `helper_reduce.c:153`):
  *   tr ' ' '\n' | tr '[:upper:]' '[:lower:]' | sed -e 's/[^a-z]//g'
  * then counting non-empty lines (our deliberate, documented deviation:
  * empty tokens are dropped — SURVEY.md §7.0). This also exercises
  * wholetext reads at real file sizes (war_and_peace.txt is 3.2 MB).
  */
class GoldenCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val postings =
    TextCorpus.postings(spark, "/root/reference/data").cache()

  test("corpus loads all 48 visible documents with reference doc names") {
    val names = postings.select("doc_name").distinct()
      .as[String].collect().toSet
    assert(names.size === 48)
    // spot-check the get_origin_name derivation (worker.c:285-302):
    // dirs stripped, extension cut at the first dot of the basename
    assert(names.contains("hamlet"))          // tragedies/hamlet (no ext)
    assert(names.contains("war_and_peace"))   // Tolstoy/war_and_peace.txt
    assert(names.contains("Miserables"))      // Hugo/Miserables.txt
    assert(names.contains("glossary"))
    assert(!names.exists(_.contains("/")))
    assert(!names.exists(_.contains(".")))
  }

  test("exact postings for known terms match the reference shell pipeline") {
    val tf = postings
      .filter(col("term").isin("the", "pierre", "hamlet") &&
        col("doc_name").isin("hamlet", "war_and_peace"))
      .as[(String, String, Long)].collect()
      .map { case (t, d, c) => (t, d) -> c }.toMap
    assert(tf(("the", "hamlet")) === 1116L)
    assert(tf(("hamlet", "hamlet")) === 134L)
    assert(tf(("the", "war_and_peace")) === 34560L)
    assert(tf(("pierre", "war_and_peace")) === 1784L)
    assert(!tf.contains(("pierre", "hamlet")))
    assert(!tf.contains(("hamlet", "war_and_peace")))
  }

  test("per-document token totals match the reference shell pipeline") {
    val totals = postings
      .filter(col("doc_name").isin("hamlet", "war_and_peace"))
      .groupBy("doc_name").agg(sum("tf").as("n"))
      .as[(String, Long)].collect().toMap
    assert(totals("hamlet") === 31088L)
    assert(totals("war_and_peace") === 564836L)
  }
}
