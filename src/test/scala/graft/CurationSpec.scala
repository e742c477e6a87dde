package graft

import graft.operators.{Privacy, Sampling}

/** Deterministic-curation operators: stratified sampling + privacy. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val a = Sampling.stratifiedSample(spark, sf, Map("en" -> 25), 60)
      .as[(Long, String)].collect()
    val b = Sampling.stratifiedSample(spark, sf, Map("en" -> 25), 60)
      .as[(Long, String)].collect()
    assert(a.sameElements(b), "sample changed between runs")
    // membership is the pure hash rule — recompute per row
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val expect = docs.filter { case (id, lang) =>
      ((id * 2654435761L) % 4294967296L) % 100 <
        (if (lang == "en") 25 else 60)
    }.sortBy(_._1)
    assert(a.sameElements(expect))
  }

  test("stratifiedSampleStats: achieved rate within 12pp of requested") {
    val stats = Sampling.stratifiedSampleStats(spark, sf, Map("en" -> 25), 60)
      .select("lang", "req_pct", "got_pct")
      .as[(String, Int, Double)].collect()
    assert(stats.map(_._1).toSet.contains("en"))
    stats.foreach { case (lang, req, got) =>
      assert(math.abs(got - req) < 12.0,
        s"$lang: requested $req%, achieved $got%")
    }
  }

  test("pseudonymization is a bijection that still joins") {
    val masked = Privacy.pseudonymizeCustomers(spark, sf)
    val rows = masked.select("c_custkey", "pseudo_key", "name_masked")
      .as[(Long, Long, String)].collect()
    // injective on this key space (odd multiplier mod 2^32 is a bijection)
    assert(rows.map(_._2).distinct.length === rows.length)
    // no digits survive masking
    assert(rows.forall(r => !r._3.exists(_.isDigit)))
    // orders joined through the pseudonym reconcile with a raw-key join
    val viaPseudo = Privacy.ordersByPseudonym(spark, sf)
      .as[(Long, Long, Double)].collect().map { case (k, n, _) => k -> n }.toMap
    val raw = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey").count()
      .as[(Long, Long)].collect()
    raw.foreach { case (ck, n) =>
      val pk = (ck * 2654435761L) % 4294967296L
      assert(viaPseudo(pk) === n, s"custkey $ck lost orders via pseudonym")
    }
  }
}
