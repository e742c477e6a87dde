package graft

import graft.operators.{Curate, Privacy, Sampling}

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

  test("v2 curation: subset of v1, gates enforced, and some docs gated out") {
    val v1 = Curate.curateCorpus(spark, sf).select("doc_id")
      .as[Long].collect().toSet
    val v2 = Curate.curateCorpusV2(spark, sf).collect()
    val v2Ids = v2.map(_.getAs[Long]("doc_id")).toSet
    assert(v2Ids.subsetOf(v1), "v2 admitted a doc v1's gates rejected")
    assert(v2Ids.size < v1.size, "content gates dropped nothing — degenerate")
    v2.foreach { r =>
      assert(r.getAs[Double]("boiler_ratio") <= 0.5)
      assert(r.getAs[Double]("dup_bigram_ratio") <= 0.08)
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

  test("pareto frontier ≡ brute-force dominance; bucketing-invariant") {
    // deterministic pseudo-random points with deliberate collisions so
    // the equal-cost and equal-point tie rules are exercised
    val pts = (0L until 400L).map { i =>
      val c = (i * 2654435761L) % 97      // cost: minimize
      val q = (i * 40503L) % 89           // quality: maximize
      (i, c, q)
    }
    val df = pts.toDF("doc_id", "n_chars", "n_distinct")
    def brute = pts.filter { case (_, c, q) =>
      !pts.exists { case (_, c2, q2) =>
        c2 <= c && q2 >= q && (c2 < c || q2 > q) }
    }.map(_._1).toSet
    val got32 = graft.operators.Curate.frontierOf(df)
      .select("doc_id").as[Long].collect().toSet
    assert(got32 === brute)
    // the two-phase result must not depend on the bucket count
    val got1 = graft.operators.Curate.frontierOf(df, nBuckets = 1)
      .select("doc_id").as[Long].collect().toSet
    val got7 = graft.operators.Curate.frontierOf(df, nBuckets = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(got1 === brute && got7 === brute)
    // duplicated frontier points: equal (cost, quality) never dominate
    // each other — BOTH survive
    val dup = Seq((1L, 10L, 50L), (2L, 10L, 50L), (3L, 20L, 40L))
      .toDF("doc_id", "n_chars", "n_distinct")
    val keep = graft.operators.Curate.frontierOf(dup)
      .select("doc_id").as[Long].collect().toSet
    assert(keep === Set(1L, 2L))
  }

  test("dsirWeights == driver-side two-LM micro-nat recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    def toks(t: String): Seq[String] =
      t.toLowerCase.split(" ", -1).toSeq
        .map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
    val all = docs.flatMap { case (_, l, t) => toks(t).map((l, _)) }
    val nS = all.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nT = all.filter(_._1 == "en").groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap
    val totS = nS.values.sum; val totT = nT.values.sum
    val v = nS.size.toLong
    def llq(n: Long, tot: Long): Long =
      math.round(math.log((n + 1).toDouble / (tot + v).toDouble) * 1e6)
    val dllq = nS.keys.map(t =>
      t -> (llq(nT.getOrElse(t, 0L), totT) - llq(nS(t), totS))).toMap
    val want = docs.map { case (id, lang, t) =>
      val ts = toks(t)
      (id, lang, ts.length.toLong, ts.map(dllq).sum)
    }.toSet
    val got = Sampling.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === want)
    // target-domain docs must score higher on average — the signal DSIR
    // resampling exists to exploit
    val byLang = got.groupBy(_._2).view
      .mapValues(g => g.map(_._4).sum.toDouble / g.size).toMap
    assert(byLang("en") > byLang.filter(_._1 != "en").values.max,
      s"en mean weight not dominant: $byLang")
  }
}
