package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sketches}

/** Invariants of the sketch and packing operators beyond the oracle's
  * value equality: the CMS one-sided error bound, Bloom's
  * no-false-negative guarantee, and conservation laws of the packing
  * manifest.
  */
class SketchesPackingSpec extends SparkTestBase {

  test("CMS bucket: engine-side bucket of a NEGATIVE key matches the driver probe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a -1 sentinel user_id (or any negative hash) must land in the same
    // cell engine-side as the driver-computed probe bucket — Scala and
    // SQL % both preserve sign, so both sides need the +P normalization
    val keys = Seq(-1L, -987654321L, Long.MinValue + 1, 0L, 42L)
    val df = keys.toDF("h")
    for (d <- 0 until Sketches.Depth) {
      val got = df.select(Sketches.bucket(col("h"), d, 1024).as("b"))
        .as[Long].collect().toSeq
      val want = keys.map(Sketches.bucketLit(_, d, 1024))
      assert(got === want, s"row $d: engine buckets diverge from probe buckets")
      got.foreach(b => assert(b >= 0 && b < 1024))
    }
  }

  test("CMS: estimate >= exact for every probe; exact for absent terms' truth") {
    val rows = Sketches.cmsEstimate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (term, est, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated $term: $est < $exact")
    }
    val absent = rows.filter(_.getString(0) == "zyzzyva")
    assert(absent.length == 1 && absent.head.getLong(2) == 0L)
  }

  test("Bloom: no false negatives — every present probe is claimed present") {
    val rows = Sketches.bloomAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (term, claimed, actual) = (r.getString(0), r.getInt(1), r.getInt(2))
      if (actual == 1)
        assert(claimed == 1, s"Bloom false negative on $term")
    }
  }

  test("packing: window coverage conserves tokens and matches the summary") {
    val C = 512
    val sum = Packing.packingSummary(spark, sf, C).head()
    val (total, nDocs, nWindows, lastFill) =
      (sum.getLong(0), sum.getLong(1), sum.getLong(3), sum.getLong(4))
    assert(nWindows == (total + C - 1) / C,
      s"window count $nWindows != ceil($total / $C)")
    assert(lastFill > 0 && lastFill <= C)
    val hist = Packing.packingHistogram(spark, sf, C)
    // every window appears exactly once in the histogram's expansion
    val histWindows = hist.agg(
      org.apache.spark.sql.functions.sum(col("n_windows"))).head().getLong(0)
    assert(histWindows == nWindows,
      s"histogram covers $histWindows windows, summary says $nWindows")
    // doc fragments: each split doc adds one fragment per extra window
    val fragments = hist.agg(org.apache.spark.sql.functions.sum(
      col("docs_in_window") * col("n_windows"))).head().getLong(0)
    assert(fragments >= nDocs)
    // two-phase prefix sum must tile the stream: fragments = n_docs +
    // boundary crossings
    val manifest = Packing.packManifest(spark, sf, C)
    val crossings = manifest.agg(org.apache.spark.sql.functions.sum(
      col("last_window") - col("first_window"))).head().getLong(0)
    assert(fragments == nDocs + crossings)
  }

  test("CMS merge law: shard cells summed cellwise == whole-corpus cells") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val docs = graft.sources.Tables.documents(spark, sf)
    val width = 64
    val whole = Sketches.cmsCells(
      Sketches.termCountsOf(docs), width)
    val a = Sketches.cmsCells(
      Sketches.termCountsOf(docs.filter(col("doc_id") % 2 === 0)), width)
    val b = Sketches.cmsCells(
      Sketches.termCountsOf(docs.filter(col("doc_id") % 2 === 1)), width)
    val merged = a.unionByName(b)
      .groupBy("d", "bucket").agg(fsum(col("cell")).as("cell"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "cellwise-summed shard sketches differ from the whole-corpus sketch")
  }

  test("Bloom merge law: shard bit sets unioned == whole-corpus bit set") {
    val docs = graft.sources.Tables.documents(spark, sf)
    def vocab(d: org.apache.spark.sql.DataFrame) =
      d.select(graft.functions.TextFunctions.explodedTokens(col("text")).as("term"))
        .distinct()
    val m = 4096
    val whole = Sketches.bloomBits(vocab(docs), m)
    val merged = Sketches.bloomBits(vocab(docs.filter(col("doc_id") % 2 === 0)), m)
      .unionByName(Sketches.bloomBits(vocab(docs.filter(col("doc_id") % 2 === 1)), m))
      .distinct()
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "unioned shard bit sets differ from the whole-corpus bit set")
  }

  test("histogram percentiles: estimate within one bin width of exact") {
    val rows = Sketches.histPercentiles(spark, sf).collect()
    assert(rows.length == 3)
    val stats = graft.sources.Tables.events(spark, sf)
      .agg(org.apache.spark.sql.functions.min(col("value")),
        org.apache.spark.sql.functions.max(col("value"))).head()
    val binW = (stats.getDouble(1) - stats.getDouble(0)) / 1000
    rows.foreach { r =>
      val err = r.getAs[Double]("abs_err")
      assert(err <= binW + 1e-9,
        s"p=${r.getAs[Double]("p")} estimate off by $err > bin width $binW")
    }
  }

  test("packing: bucket count does not change the prefix sum") {
    val a = Packing.packManifest(spark, sf, 512, nBuckets = 1)
      .select("doc_id", "start_off").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Packing.packManifest(spark, sf, 512, nBuckets = 7)
      .select("doc_id", "start_off").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b, "two-phase prefix sum depends on bucket count")
  }
}
