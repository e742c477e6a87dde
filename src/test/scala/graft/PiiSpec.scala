package graft

import java.util.regex.Pattern

import org.apache.spark.sql.functions._

import graft.operators.Privacy
import graft.sources.Tables

/** Driver-side recompute of the PII census/redaction: rebuild the
  * augmented text and run plain java.util.regex over the collected corpus,
  * then compare against the distributed query — the engine-independent
  * ground truth for the pattern semantics (the oracle check pins
  * Spark-vs-DuckDB parity; this pins both against a third, hand-rolled
  * evaluation).
  */
class PiiSpec extends SparkTestBase {

  private def pad(n: Long, w: Int): String = {
    val s = n.toString
    ("0" * math.max(0, w - s.length)) + s
  }

  /** The augmentation rule of [[Privacy.piiAugSql]], in plain Scala. */
  private def augment(docId: Long, text: String): String = {
    val sb = new StringBuilder(text)
    if (docId % 3 == 0) sb.append(s" contact user$docId@example.com now")
    if (docId % 5 == 0) sb.append(s" call +1-555-${pad(docId % 10000, 4)}")
    if (docId % 7 == 0) sb.append(s" host 10.${docId % 200}.${docId % 250}.1")
    if (docId % 11 == 0)
      sb.append(s" ref ${pad(docId % 1000, 3)}-${pad(docId % 100, 2)}-${pad(docId % 10000, 4)}")
    sb.toString
  }

  private def countMatches(p: Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  test("per-source census matches a java.util.regex recompute; residual 0") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val pats = Privacy.PiiPatterns.map { case (n, p, r) =>
      (n, Pattern.compile(p), r)
    }
    val expected = docs.map { case (id, src, text) =>
      val aug = augment(id, text)
      val counts = pats.map { case (n, p, _) => n -> countMatches(p, aug) }.toMap
      val scrubbed = pats.foldLeft(aug) { case (s, (_, p, r)) =>
        p.matcher(s).replaceAll(r)
      }
      (src, counts, aug.length.toLong - scrubbed.length,
        counts.values.sum, pats.map { case (_, p, _) => countMatches(p, scrubbed) }.sum)
    }.groupBy(_._1).map { case (src, rows) =>
      src -> (rows.length.toLong,
        rows.count(_._4 > 0).toLong,
        rows.map(_._2("email")).sum, rows.map(_._2("phone")).sum,
        rows.map(_._2("ip")).sum, rows.map(_._2("id")).sum,
        rows.map(_._3.toLong).sum, rows.map(_._5).sum)
    }
    val got = Privacy.piiScrub(spark, sf).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) =>
      assert(got(src) == e, s"census mismatch for $src")
      assert(got(src)._8 == 0L, s"residual PII after redaction in $src")
    }
    // the synthetic corpus genuinely carries every PII type (a census
    // over zero matches would prove nothing)
    assert(expected.values.map(_._3).sum > 0, "no emails in the carrier")
    assert(expected.values.map(_._4).sum > 0, "no phones in the carrier")
    assert(expected.values.map(_._5).sum > 0, "no IPs in the carrier")
    assert(expected.values.map(_._6).sum > 0, "no ids in the carrier")
  }

  test("pii gate drops exactly the docs with more than maxPii matches") {
    val base = graft.operators.Curate.curateCorpus(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Privacy.piiCurate(spark, sf, maxPii = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(kept.keySet.subsetOf(base), "pii gate must only ever remove docs")
    kept.values.foreach(t => assert(t <= 1L))
    // a doc divisible by two carriers (e.g. 15 = 3·5 → email + phone)
    // must be gone; a singleton-carrier doc must survive if it passed
    // the base gates
    val dropped = base.filter(id =>
      Seq(3, 5, 7, 11).count(m => id % m == 0) > 1)
    assert(dropped.forall(!kept.contains(_)),
      "multi-PII docs must be dropped")
    assert(base.filter(id =>
      Seq(3, 5, 7, 11).count(m => id % m == 0) <= 1).forall(kept.contains),
      "docs within the PII budget must survive")
  }
}
