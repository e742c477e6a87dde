package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.sources.Tables

class ClusteringSpec extends SparkTestBase {

  /** Rows the parquet scan actually READ (post row-group skipping) for a
    * one-pass query. AQE off so the executed plan is directly walkable.
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  test("Z-clustered layout skips row groups the rectangle predicate excludes") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rect = (df: DataFrame) => df.where(
        col("l_shipdate").between(lit(Clustering.RectLo), lit(Clustering.RectHi))
          && col("l_partkey").between(1, 100))
      val plainRead = scanRows(rect(Tables.lineitem(spark, sf)))
      val clustRead = scanRows(rect(Clustering.clusteredLineitem(spark, sf)))
      val total = Tables.lineitem(spark, sf).count()
      // the unclustered corpus is written in orderkey order: shipdate and
      // partkey stats are wide per row group, nothing skips
      assert(plainRead == total,
        s"expected no skipping on the plain copy: read $plainRead of $total")
      assert(clustRead < total / 2,
        s"expected >50% of rows skipped on the Z-clustered copy: " +
          s"read $clustRead of $total (plain read $plainRead)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("both rectangle predicates are pushed to the clustered scan") {
    // AQE's plan wrapper hides the scan until execution — walk the
    // non-adaptive physical plan, where the scan node is directly visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = Clustering.clusteredRectRevenue(spark, sf)
      val scan = q.queryExecution.executedPlan
        .collectFirst { case s: FileSourceScanExec => s }
      val pushed = scan.map(_.metadata("PushedFilters")).getOrElse("")
      assert(pushed.contains("l_shipdate") && pushed.contains("l_partkey"),
        s"expected both predicates pushed, got: $pushed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("clustered copy is lossless: rectangle query matches the plain table") {
    val clustered = Clustering.clusteredRectRevenue(spark, sf).collect().toSeq
    val plain = Clustering.rectRevenue(Tables.lineitem(spark, sf))
      .collect().toSeq
    assert(clustered == plain)
    assert(clustered.nonEmpty)
  }

  test("layout dir embeds the format version (stale pre-change copies miss)") {
    // the mtime staleness check only sees SOURCE changes; a format change
    // (column encoding, Z bit budget) must change the cache dir name so a
    // machine holding a pre-change /tmp copy rebuilds instead of serving it
    val dir = new java.io.File(Clustering.ensureClustered(spark, sf))
    // name = version segment + the collision-free corpus value token
    // (sanitized tail + 12-hex sha prefix)
    assert(dir.getName.matches("graft_lineitem_z_v\\d+_.+_\\p{XDigit}{12}"),
      s"expected a versioned layout dir name, got: ${dir.getName}")
  }

  test("zValue interleaves bits (locality: nearby points share prefixes)") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3))
      .toDF("x", "y")
      .select(Clustering.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(0L, 1L, 2L, 3L, 4L, 8L, 15L))
  }

  test("manifest prunes files at planning time; result identical") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pruned = Clustering.prunedRectRevenue(spark, sf)
      val rows = pruned.collect().toSeq
      val full = Clustering.clusteredRectRevenue(spark, sf).collect().toSeq
      assert(rows == full)
      assert(rows.nonEmpty)
      // the scan must never even LIST the non-intersecting files — the
      // numFiles metric is the planning-time analogue of row-group skips
      val files = pruned.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }.sum
      assert(files > 0 && files < Clustering.NumFiles,
        s"expected planning-time file pruning: scanned $files of ${Clustering.NumFiles}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("normShift fits any key range into the 31-bit budget, order-preserving") {
    assert(Clustering.normShift(0L) === 0)
    assert(Clustering.normShift((1L << 31) - 1) === 0)
    assert(Clustering.normShift(1L << 31) === 1)
    // partkey at SF 100k: 200k·100k = 2e10 → needs 35 bits → shift 4
    assert(Clustering.normShift(20000000000L) === 4)
    val ks = Seq(0L, 5L, 1L << 33, (1L << 35) + 7)
    val s = Clustering.normShift(ks.max)
    val shifted = ks.map(_ >> s)
    assert(shifted === shifted.sorted)
    assert(shifted.max < (1L << 31))
  }

  test("zValue keeps bits above 2^21 (no aliasing of distant keys)") {
    import spark.implicits._
    // with a 21-bit budget these three x values would collapse into the
    // same tile as (x mod 2^21); 31 bits/dim must keep them distinct and
    // ordered (y=0 ⇒ z = bits of x spread to even positions)
    val big = Seq(1 << 22, 1 << 25, (1 << 30) + 1)
    val zs = big.toDF("x")
      .select(Clustering.zValue(col("x"), lit(0)).as("z"))
      .as[Long].collect().toSeq
    def spread(v: Long): Long =
      (0 until 31).map(i => ((v >> i) & 1L) << (2 * i)).sum
    assert(zs == big.map(x => spread(x.toLong)))
    assert(zs.distinct.size == 3 && zs == zs.sorted)
  }
}
