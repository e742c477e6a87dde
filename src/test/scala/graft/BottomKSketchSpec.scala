package graft

import org.apache.spark.sql.functions._

import graft.functions.{BottomKSketchAgg, KmvHashesAgg, KmvSketchAgg}
import graft.operators.{IndexQueries, Quantiles}

/** The native bottom-k sample sketch and the KMV member variant: set
  * semantics, layout invariance (the merge path), SQL surface, and the
  * query-level uses (sketch quantiles, range boundaries, native vocab
  * overlap) against brute-force truth.
  */
class BottomKSketchSpec extends SparkTestBase {
  import spark.implicits._

  // synthetic (h, v) rows with hash ties and exact duplicates
  private lazy val pairs: Seq[(Long, Double)] =
    (1 to 400).map(i => ((i % 97).toLong, (i % 31).toDouble)) ++
      Seq((5L, 2.0), (5L, 2.0), (5L, -1.0)) // dup pair + h-tie

  private def expectedSample(k: Int): Seq[Double] =
    pairs.distinct.sorted.take(k).map(_._2).sorted

  test("bottomk_sketch == k smallest distinct (h,v) pairs, layout-invariant") {
    for (k <- Seq(5, 64, 10000); parts <- Seq(1, 7)) {
      val df = pairs.toDF("h", "v").repartition(parts)
      val got = df.agg(BottomKSketchAgg.bottomkSketch(col("h"), col("v"), k))
        .head().getSeq[Double](0)
      assert(got == expectedSample(k), s"k=$k parts=$parts")
    }
  }

  test("bottomk_sketch skips nulls; empty input yields empty array") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, null), (null, 1.0), (2L, 3.0)).toDF("h", "v")
    val got = df.agg(BottomKSketchAgg.bottomkSketch(col("h"), col("v"), 8))
      .head().getSeq[Double](0)
    assert(got == Seq(3.0))
    val empty = spark.emptyDataset[(Long, Double)].toDF("h", "v")
      .agg(BottomKSketchAgg.bottomkSketch(col("h"), col("v"), 8))
      .head().getSeq[Double](0)
    assert(empty.isEmpty)
  }

  test("SQL surface: bottomk_sketch and kmv_hashes registered") {
    GraftExtensions.register(spark)
    pairs.toDF("h", "v").createOrReplaceTempView("bk_pairs")
    val viaSql = spark.sql(
      "SELECT bottomk_sketch(h, v, 64) FROM bk_pairs")
      .head().getSeq[Double](0)
    assert(viaSql == expectedSample(64))
    val hs = spark.sql("SELECT kmv_hashes(h, 16) FROM bk_pairs")
      .head().getSeq[Long](0)
    assert(hs == pairs.map(_._1).distinct.sorted.take(16))
  }

  test("kmv_hashes members are ascending and consistent with kmv_sketch") {
    val df = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.explodedTokens(col("text")).as("term"))
      .distinct()
      .select(graft.functions.HashFunctions.polyFold64(col("term")).as("h"))
      .repartition(5)
    val members = df.agg(KmvHashesAgg.kmvHashes(col("h"), 64))
      .head().getSeq[Long](0)
    val brute = df.distinct().collect().map(_.getLong(0)).sorted.take(64).toSeq
    assert(members == brute)
    val pair = df.agg(KmvSketchAgg.kmvSketch(col("h"), 64)).head().getStruct(0)
    assert(pair.getLong(0) == members.length.toLong)
    assert(pair.getLong(1) == members.last)
  }

  test("vocabOverlapNative == vocabOverlapKMV (identical matrix)") {
    val a = IndexQueries.vocabOverlapKMV(spark, sf, 64).collect().toSeq
    val b = IndexQueries.vocabOverlapNative(spark, sf, 64).collect().toSeq
    assert(a == b)
  }

  test("sketchQuantiles matches a brute-force replica of the sample rule") {
    val rows = graft.sources.Tables.events(spark, sf)
      .where(col("value").isNotNull)
      .select(col("event_type"),
        graft.functions.HashFunctions.knuthMod(col("event_id"), 4294967296L).as("h"),
        col("value").cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = rows.groupBy(_._1).map { case (t, xs) =>
      val sample = xs.map(x => (x._2, x._3)).distinct.sorted.take(256)
        .map(_._2).sorted
      val n = sample.length
      def q(p: Int) = sample((p * (n - 1)) / 100)
      t -> ((n.toLong, q(50), q(90), q(99)))
    }
    val got = Quantiles.sketchQuantiles(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == want.keySet)
    got.foreach { r =>
      val w = want(r.getString(0))
      assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) == w,
        s"event_type=${r.getString(0)}")
    }
  }

  test("rangeShards: covers the corpus with ordered, non-overlapping ranges") {
    val rows = Quantiles.rangeShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val nDocs = graft.sources.Tables.documents(spark, sf)
      .where(col("n_chars").isNotNull).count()
    assert(rows.map(_._2).sum == nDocs, "every doc lands in exactly one shard")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 31))
    rows.sortBy(_._1).sliding(2).foreach {
      case Array(p, n) => assert(p._4 <= n._3,
        s"shard ${p._1} range must precede shard ${n._1}")
      case _ =>
    }
  }

  test("streaming quantile sketch drains to the batch result") {
    val batch = Quantiles.sketchQuantiles(spark, sf).collect().toSeq
    val streamed = graft.streaming.StreamingSketch
      .sketchQuantilesAvailableNow(spark, sf).collect().toSeq
    assert(streamed == batch)
  }

  test("rangeBoundaries: 31 non-decreasing cuts within the data range") {
    val rows = Quantiles.rangeBoundaries(spark, sf).collect()
    assert(rows.length == 31)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 31L))
    val bs = rows.map(_.getDouble(1)).toSeq
    assert(bs == bs.sorted, "boundaries must be non-decreasing")
    val (lo, hi) = {
      val r = graft.sources.Tables.documents(spark, sf)
        .agg(min("n_chars"), max("n_chars")).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    assert(bs.head >= lo && bs.last <= hi)
  }
}
