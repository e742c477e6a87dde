package graft

import org.apache.spark.sql.functions._

import graft.operators.IndexQueries

/** Vocabulary-cardinality sketches: the declared KMV query (oracle-checked
  * by the driver) and the library-only HLL++ variant, both audited here
  * against the exact per-language distinct count.
  */
class VocabSketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val exact: Map[String, Long] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), graft.functions.TextFunctions.explodedTokens(col("text")).as("term"))
      .groupBy("lang").agg(countDistinct("term").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("vocabKMV: exact_vocab column is exact; estimate within 50% of truth") {
    val rows = IndexQueries.vocabKMV(spark, sf, 64).collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val (lang, k, est, ex) = (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(ex == exact(lang), s"$lang exact_vocab $ex != ${exact(lang)}")
      assert(k <= 64)
      // KMV relative error ~ 1/sqrt(k) ≈ 12.5% at k=64; 50% is a loose
      // deterministic bound that still catches a broken hash or formula
      assert(est > ex / 2 && est < ex * 2, s"$lang KMV estimate $est vs exact $ex")
    }
  }

  test("vocabOverlapKMV == brute-force KMV set algebra; exact audit leg exact") {
    val k = 64
    // brute-force: per-lang hash sets + term sets collected once
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"),
        graft.functions.TextFunctions.explodedTokens(col("text")).as("term"))
      .distinct()
      .select(col("lang"), col("term"),
        graft.functions.HashFunctions.polyFold64(col("term")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val terms = rows.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    val hashes = rows.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._3).toSet }
    val kmin = hashes.map { case (l, hs) => l -> hs.toSeq.sorted.take(k) }
    val space = 2147483647.0 * 4294967296.0
    val want = (for {
      la <- kmin.keys.toSeq; lb <- kmin.keys.toSeq if la < lb
      merged = (kmin(la) ++ kmin(lb)).distinct.sorted.take(k)
      kk = merged.length
      kthMin = merged.last
      nBoth = merged.count(h => kmin(la).contains(h) && kmin(lb).contains(h))
      interEx = (terms(la) & terms(lb)).size.toLong
      unionEx = (terms(la) | terms(lb)).size.toLong
    } yield (la, lb,
      BigDecimal(nBoth.toDouble / kk).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      math.floor((kk - 1) * space / kthMin + 0.5).toLong,
      interEx, unionEx,
      BigDecimal(interEx.toDouble / unionEx).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val got = IndexQueries.vocabOverlapKMV(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(want.nonEmpty && got === want)
  }

  test("vocabCoverage == driver-side ranked cumulative shares") {
    val counts = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.explodedTokens(col("text")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ranked = counts.sortBy { case (t, n) => (-n, t) }
    val total = counts.map(_._2).sum
    val cums = ranked.scanLeft(0L)(_ + _._2).drop(1)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(100, 1000, 10000).map { cut =>
      val v = math.min(cut, ranked.length)
      (cut.toLong, v.toLong, cums(v - 1), total, r6(cums(v - 1).toDouble / total))
    }.toSet
    val got = graft.operators.IndexQueries.vocabCoverage(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got === want)
  }

  test("vocabApprox (HLL++): exact column exact; approx within rsd bounds") {
    val rows = IndexQueries.vocabApprox(spark, sf).collect()
    rows.foreach { r =>
      val (lang, ex, approx) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(ex == exact(lang), s"$lang exact_vocab $ex != ${exact(lang)}")
      assert(approx > ex * 0.9 && approx < ex * 1.1,
        s"$lang HLL++ approx $approx vs exact $ex (rsd=0.01 requested)")
    }
  }

  test("native KmvSketchAgg ≡ declarative window KMV, row for row") {
    val native = graft.operators.IndexQueries.vocabKMVNative(spark, sf)
      .collect().map(_.toString).sorted
    val window = graft.operators.IndexQueries.vocabKMV(spark, sf)
      .collect().map(_.toString).sorted
    assert(native === window)
    assert(native.nonEmpty)
  }

  test("KmvSketchAgg plans partial+final (map-side sketch combine)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.IndexQueries.vocabKMVNative(spark, sf)
        .queryExecution.executedPlan
      // TypedImperativeAggregate runs in ObjectHashAggregate (or sort
      // fallback); TWO aggregate stages for the sketch = partial map-side
      // state + final merge — the input-vs-k reduction under test
      val aggStages = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
          if a.aggregateExpressions.exists(
            _.aggregateFunction.isInstanceOf[graft.functions.KmvSketchAgg]) => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if a.aggregateExpressions.exists(
            _.aggregateFunction.isInstanceOf[graft.functions.KmvSketchAgg]) => a
      }
      assert(aggStages.length === 2,
        s"expected partial+final sketch aggregation in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("kmv_sketch is callable from SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    spark.range(0, 1000).selectExpr("id % 100 AS g", "hash(id) AS h")
      .createOrReplaceTempView("kmv_in")
    val row = spark.sql(
      """SELECT sk.k AS k, sk.kth_min AS kth_min FROM (
        |  SELECT kmv_sketch(CAST(h AS BIGINT), 8) AS sk FROM kmv_in)"""
        .stripMargin).collect().head
    assert(row.getLong(0) === 8L)
    // kth_min is the 8th smallest distinct hash — recompute brute force
    val hs = spark.range(0, 1000).selectExpr("CAST(hash(id) AS BIGINT) AS h")
      .collect().map(_.getLong(0)).distinct.sorted
    assert(row.getLong(1) === hs(7))
  }

  test("KmvState: duplicates occupy one slot; merge keeps k smallest") {
    val a = new graft.functions.KmvState(4)
    Seq(5L, 3L, 5L, 9L, 1L, 7L).foreach(a.add)
    assert(a.mins.toArray.toSeq === Seq(1L, 3L, 5L, 7L))
    val b = new graft.functions.KmvState(4)
    Seq(2L, 8L, 0L, 2L).foreach(b.add)
    a.merge(b)
    assert(a.mins.toArray.toSeq === Seq(0L, 1L, 2L, 3L))
  }
}
