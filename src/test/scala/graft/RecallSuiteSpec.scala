package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Events, Similarity}

/** The index/compression fidelity suite (q_ann_recall, q_dim_ablation,
  * q_quantize_recall) and the EWMA anomaly detector — structural and
  * semantic invariants beyond the driver's oracle hash.
  */
class RecallSuiteSpec extends SparkTestBase {
  import spark.implicits._

  test("annRecall: one row per query, hits bounded by k, recall consistent") {
    val rows = Similarity.annRecall(spark, sf, 5, 10)
      .select("query_id", "n_exact", "n_hits", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == (0L until 5L))
    rows.foreach { case (q, nExact, nHits, recall) =>
      assert(nExact == 10, s"query $q reference size")
      assert(nHits >= 0 && nHits <= nExact, s"query $q hits out of range")
      assert(math.abs(recall - nHits.toDouble / nExact) < 1e-9,
        s"query $q recall inconsistent with counts")
    }
    // the tier must actually retrieve SOMETHING relevant; the absolute
    // level is corpus-dependent (near-random synthetic vectors spread
    // true neighbors across cells — nprobe 3 of 8 measures ~0.2 here,
    // and that LOW number is exactly what the query exists to expose)
    val mean = rows.map(_._4).sum / rows.length
    assert(mean > 0.05, s"IVF-PQ mean recall@10 collapsed to $mean")
  }

  test("recallCurve: k=10 leg equals annRecall; counts bounded by k") {
    val curve = Similarity.recallCurve(spark, sf, 5, 10)
      .select("k", "query_id", "n_exact", "n_hits", "recall")
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(curve.map(_._1).toSet == Set(1, 5, 10))
    curve.foreach { case (k, q, nExact, nHits, _) =>
      assert(nExact == k, s"(k=$k, q=$q) reference size")
      assert(nHits >= 0 && nHits <= nExact, s"(k=$k, q=$q) hits")
    }
    val at10 = curve.filter(_._1 == 10)
      .map(r => (r._2, r._3, r._4, r._5)).sortBy(_._1).toSeq
    val ann = Similarity.annRecall(spark, sf, 5, 10)
      .select("query_id", "n_exact", "n_hits", "recall")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(at10 == ann, "k=10 leg must equal the headline recall table")
  }

  test("dimAblation: 32-dim recall dominates 16-dim recall on average") {
    val byDims = Similarity.dimAblation(spark, sf, 5, 10)
      .select("dims", "query_id", "n_exact", "n_hits", "recall")
      .as[(Int, Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    assert(byDims.keySet == Set(16, 32))
    assert(byDims(16).map(_._2).toSet == (0L until 5L).toSet)
    val mean16 = byDims(16).map(_._5).sum / 5
    val mean32 = byDims(32).map(_._5).sum / 5
    // more preserved dimensions can only help a cosine prefix on average;
    // allow exact ties (tiny corpus) but never an inversion
    assert(mean32 >= mean16 - 1e-9, s"ablation inverted: $mean32 < $mean16")
  }

  test("quantizeRecall: int8 codes retain most of the exact top-10") {
    val rows = Similarity.quantizeRecall(spark, sf, 5, 10)
      .select("n_exact", "n_hits", "recall").as[(Long, Long, Double)].collect()
    assert(rows.length == 5)
    // 8-bit symmetric quantization perturbs cosines by ~1e-3 — recall
    // should be near-perfect, and any value below 0.7 means the scoring
    // path broke (e.g. scale applied asymmetrically)
    val mean = rows.map(_._3).sum / rows.length
    assert(mean >= 0.7, s"int8 recall collapsed to $mean")
  }

  test("sketchErrorAudit: rank window is exact and the error its distance") {
    val rows = graft.operators.Quantiles.sketchErrorAudit(spark, sf)
      .select("event_type", "p", "n", "est", "rank_lo", "rank_hi",
        "target", "rank_err")
      .as[(String, Int, Long, Double, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // driver-side exact ranks per (type, estimate)
    val vals = graft.sources.Tables.events(spark, sf)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
    rows.foreach { case (t, p, n, est, lo, hi, target, err) =>
      val vs = vals(t).map(_._2)
      assert(n == vs.length, s"($t,$p) population")
      assert(lo == vs.count(_ < est), s"($t,$p) rank_lo")
      assert(hi == vs.count(_ <= est) - 1, s"($t,$p) rank_hi")
      assert(target == p.toLong * (n - 1) / 100, s"($t,$p) target")
      assert(err == math.max(0L, math.max(lo - target, target - hi)),
        s"($t,$p) rank_err")
      // a 256-sample sketch must land within ~a few percent of the target
      // rank; 20% of the population is a broken sketch, not noise
      assert(err.toDouble / n < 0.2, s"($t,$p) rank error $err of $n")
    }
  }

  test("ewmaAnomalies: forecast is the exact 16-lag EWMA of the series") {
    val series = Events
      .ewmaAnomalies(spark, sf)
      .select("hour_id", "n", "ewma_scaled", "forecast", "is_anomaly")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(series.nonEmpty, "no hours with a full 16-lag window")
    // replay the definition driver-side from the raw hourly counts
    val hours = graft.sources.Tables.events(spark, sf)
      .selectExpr("unix_millis(ts) div 3600000 AS hour_id")
      .groupBy("hour_id").count()
      .as[(Long, Long)].collect().sortBy(_._1)
    val idx = hours.map(_._1).zipWithIndex.toMap
    series.foreach { case (h, n, s, forecast, flag) =>
      val i = idx(h)
      assert(i >= 16, s"hour $h flagged without 16 preceding rows")
      val expS = (1 to 16).map(d => hours(i - d)._2 * (1L << (16 - d))).sum
      assert(s == expS, s"hour $h scaled EWMA")
      assert(n == hours(i)._2, s"hour $h count")
      assert(math.abs(forecast - expS.toDouble / 65535.0) < 1e-6)
      val dev = BigInt(n) * 65535 - BigInt(expS)
      assert(flag == (dev * dev > BigInt(9) * 65535 * expS),
        s"hour $h anomaly gate")
    }
  }
}
