package graft

import org.apache.spark.sql.functions._

import graft.sources.JsonCorpus

class JsonCorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("jsonl round-trips the parquet corpus; corrupt lines quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.write.mode("overwrite").json(dir)
    // append a shard with two broken lines and one good one
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-badshard.json"),
      ("""{"doc_id": 90001, "text": "clean line", "lang": "en", "source": "srcJ", "n_chars": 10}""" + "\n" +
       """{"doc_id": 90002, "text": "truncated""" + "\n" +
       """not json at all""" + "\n").getBytes("UTF-8"))

    val (clean, quarantine) = JsonCorpus.readDocuments(spark, dir)

    val roundTrip = clean.filter(col("doc_id") < 90000L)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSet
    val original = docs
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(roundTrip === original, "jsonl round-trip altered the corpus")

    assert(clean.filter(col("doc_id") === 90001L).count() === 1)
    val bad = quarantine.as[String].collect()
    assert(bad.length === 2, s"expected 2 quarantined lines, got ${bad.toSeq}")
    assert(bad.exists(_.contains("truncated")))
    assert(bad.contains("not json at all"))
  }
}
