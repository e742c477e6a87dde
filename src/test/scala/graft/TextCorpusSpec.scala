package graft

import java.nio.file.{Files, Paths}

import graft.operators.Events
import graft.sources.TextCorpus

class TextCorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("raw text corpus: doc names derived from paths, postings correct") {
    // reference corpus shape: data/<author>/<title>
    val root = Files.createTempDirectory("graft_corpus")
    Files.createDirectories(Paths.get(s"$root/Tolstoy"))
    Files.createDirectories(Paths.get(s"$root/shakespeare/tragedies"))
    Files.writeString(Paths.get(s"$root/Tolstoy/war_and_peace.txt"),
      "Well Prince so so so")
    Files.writeString(Paths.get(s"$root/shakespeare/tragedies/hamlet"),
      "To be or not to be")
    val docs = TextCorpus.read(spark, root.toString)
      .select("doc_name").as[String].collect().toSet
    assert(docs === Set("war_and_peace", "hamlet"))
    val postings = TextCorpus.postings(spark, root.toString)
      .as[(String, String, Long)].collect()
      .map { case (t, d, tf) => (t, d) -> tf }.toMap
    assert(postings(("so", "war_and_peace")) === 3L)
    assert(postings(("to", "hamlet")) === 2L)
    assert(postings(("be", "hamlet")) === 2L)
  }

  test("asof join: one row per purchase; matched views never come later") {
    val rows = Events.asofPurchaseView(spark, sf).collect()
    val nPurchases = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.length.toLong === nPurchases)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("last_view_ms")))
        assert(r.getAs[Long]("last_view_ms") <= r.getAs[Long]("p_ms"))
    }
  }
}
