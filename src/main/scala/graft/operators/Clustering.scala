package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-column data clustering (Z-order layout) — the 2-D generalization
  * of the reference's 1-D letter-partitioned index files
  * (`/root/reference/helper_reduce.c:238-242`).
  *
  * The letter layout prunes on exactly ONE column. Interleaving the bits
  * of two key columns into a Z-value and range-partitioning + sorting the
  * write on it tiles the (shipdate, partkey) plane into files whose
  * parquet min/max footers are narrow on BOTH columns, so a query
  * predicated on either — or both — skips every non-intersecting tile at
  * scan time. Pay one range shuffle at write, serve unlimited 2-predicate
  * queries with I/O proportional to the matched rectangle, not the table.
  *
  * Scale posture: at 100 TB the clustered write is one
  * `repartitionByRange` shuffle (fully parallel, no 26-task funnels — the
  * range partitioner samples the Z-value distribution), and pruning works
  * through the stock parquet reader's row-group statistics. Row groups
  * are ~128 MB, so skipping granularity stays constant as the table
  * grows; a table format with file-level stats (the catalog analogue of
  * the reference's per-letter directory names) additionally prunes at
  * PLANNING time, but the I/O proportionality is already achieved here.
  * ClusteringSpec asserts the scan-rows drop vs the unclustered copy.
  */
object Clustering {

  /** Output files = Z-range tiles. More files = finer tiles = sharper
    * pruning but smaller row groups; 16 at test scale keeps each file one
    * row group so the spec exercises exactly the at-scale skip mechanism.
    */
  val NumFiles = 16

  /** Spread the low 32 bits of a non-negative int so bit i lands at
    * position 2i — the classic Morton magic-mask sequence: 5 shift-or-mask
    * steps instead of one expression term per bit. The Z-value is computed
    * for EVERY row of the table being clustered, so its cost is a direct
    * multiplier on the layout write; a per-bit expansion (31 terms × ~6
    * nodes each) measurably drags the whole write stage, while this is 10
    * codegen'd bitwise ops total.
    */
  private def spreadBits(x: Column): Column =
    Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8  -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL,
      2  -> 0x3333333333333333L,
      1  -> 0x5555555555555555L
    ).foldLeft(x.cast("long")) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Bit-interleave two non-negative sub-2^31 integer columns into a
    * Z-value: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Inputs wider than 31 bits must be range-normalized first (see
    * [[normShift]]) — a raw cast would wrap negative and scramble the
    * layout.
    */
  private[graft] def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Right-shift needed to fit a key range into 31 bits. Normalizing a key
    * as `(k − min) >> shift` preserves order exactly, so wide-ranged keys
    * (partkey = 200k·SF exceeds 2^31 around SF 10k) COARSEN the Z-tiling
    * instead of wrapping into aliased tiles: adjacent keys may share a
    * tile, distant keys never swap order. Shift is derived from column
    * stats at write time; 0 for every range below 2^31.
    */
  private[graft] def normShift(range: Long): Int = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(range, 1L))
    math.max(0, bits - 31)
  }

  /** Day offset of l_shipdate from the corpus epoch (non-negative). */
  private def shipDays: Column =
    datediff(col("l_shipdate"), to_date(lit("1992-01-01")))

  /** On-disk layout format version, embedded in the cache directory name.
    * BUMP THIS whenever the written format changes (column types, Z bit
    * budget, rectangle-relevant encoding): the mtime staleness check only
    * sees source-data changes, so without a version a machine holding a
    * pre-change copy in the scratch root would keep serving the old
    * layout. v2 = LTZ-micros shipdate + range-normalized 31-bit Morton Z.
    */
  private val LayoutVersion = 2

  // The layout cache lives under the configurable scratch root
  // ([[graft.util.Scratch.root]] — local tmpdir by default, shared
  // storage on a cluster) and all existence/mtime/sweep bookkeeping goes
  // through the Hadoop FileSystem API, so the SAME staleness logic works
  // on file://, hdfs://, s3a://, … paths.
  private def clusterDirName(sfDir: String): String =
    s"graft_lineitem_z_v${LayoutVersion}_" + graft.util.Scratch.valueToken(sfDir)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Newest modification time anywhere under `p` (p itself for a plain
    * file); 0 when `p` does not exist.
    */
  private def newestMtime(fs: FileSystem, p: Path): Long =
    if (!fs.exists(p)) 0L
    else {
      val st = fs.getFileStatus(p)
      if (st.isFile) st.getModificationTime
      else (st.getModificationTime +:
        fs.listStatus(p).map(s => newestMtime(fs, s.getPath)).toSeq).max
    }

  private def mtimeOf(fs: FileSystem, p: Path): Long =
    if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L

  /** True when [[ensureClustered]] found a fresh on-disk copy and skipped
    * the build — lets the bench report cache-hit vs real build honestly.
    */
  @volatile var lastEnsureWasCacheHit: Boolean = false

  /** Write (once per corpus) the Z-clustered copy of lineitem: range
    * partition by Z-value → Z-contiguous tiles, sort within partitions →
    * tight row-group stats inside each tile. The Z column itself is
    * dropped — the LAYOUT carries the information. Staleness-safe: a copy
    * older than the source parquet is rebuilt, so a refreshed corpus can
    * never serve stale tiles.
    */
  def ensureClustered(spark: SparkSession, sfDir: String): String = {
    val root = new Path(graft.util.Scratch.root(spark))
    val dir = new Path(root, clusterDirName(sfDir))
    val fs = fsOf(spark, dir)
    val success = new Path(dir, "_SUCCESS")
    // newest mtime anywhere under the source path: a multi-file parquet
    // directory rewritten in place need not bump the directory's own mtime
    val srcPath = new Path(sfDir, "lineitem.parquet")
    val srcMtime = newestMtime(fsOf(spark, srcPath), srcPath)
    lastEnsureWasCacheHit = mtimeOf(fs, success) >= srcMtime && srcMtime > 0
    if (!lastEnsureWasCacheHit) {
      // Sweep orphaned layout dirs for the SAME corpus left by earlier
      // LayoutVersions (v1 had no version segment at all): a version bump
      // renames the cache dir, and without this each bump would strand one
      // full lineitem copy (plus manifest) per machine in the scratch root.
      val hex = graft.util.Scratch.valueToken(sfDir)
      val keepPrefix = s"graft_lineitem_z_v${LayoutVersion}_$hex"
      if (fs.exists(root))
        fs.listStatus(root)
          .filter { s =>
            val n = s.getPath.getName
            n.startsWith("graft_lineitem_z_") && n.contains(hex) &&
              !n.startsWith(keepPrefix)
          }
          .foreach(s => { fs.delete(s.getPath, true); () })
      // The source parquet stores shipdate with isAdjustedToUTC=false, which
      // Spark 4 reads as TIMESTAMP_NTZ — a type its parquet filter
      // conversion cannot row-group-skip on (bigint/date/LTZ-timestamp
      // predicates skip; NTZ ones are silently dropped at the reader).
      // Rewriting the column as a UTC-adjusted INT64-micros timestamp (the
      // session TZ is UTC, so values are identical) puts the rectangle's
      // shipdate predicate on the supported pushdown path — without it the
      // layout's narrow per-tile stats are decoration.
      val tsTypeKey = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.get(tsTypeKey)
      spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS") // INT96 writes no usable stats
      try {
        val src = Tables.lineitem(spark, sfDir)
          .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
        // range-normalize both Z dimensions from column stats (one tiny
        // min/max scan): order-preserving (k − min) >> shift keeps every
        // key inside zValue's 31-bit budget at ANY scale factor — wide
        // ranges coarsen the tiling, they never alias (see normShift)
        val st = src.agg(
          min(shipDays).as("sd_min"), max(shipDays).as("sd_max"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max")
        ).head()
        val sdShift = normShift(st.getAs[Int]("sd_max").toLong - st.getAs[Int]("sd_min"))
        val pkShift = normShift(st.getAs[Long]("pk_max") - st.getAs[Long]("pk_min"))
        // Build into a per-process tmp dir, then swap: unlike an in-place
        // mode("overwrite") (which deletes the destination at job START,
        // leaving it partial for the whole build), a concurrent reader of
        // the SHARED layout cache sees either the old complete generation
        // or the new one — the exposure shrinks from the full build to
        // the delete+rename instant. Stale tmp dirs from crashed builds
        // start with keepPrefix, so the version sweep above never touches
        // a concurrent builder's live tmp.
        val tmpDir = new Path(root, keepPrefix +
          s"_build_p${graft.util.Scratch.procToken}")
        src
          .withColumn("zv", zValue(
            shiftright((shipDays - lit(st.getAs[Int]("sd_min"))).cast("long"), sdShift),
            shiftright((col("l_partkey") - lit(st.getAs[Long]("pk_min"))).cast("long"), pkShift)))
          .repartitionByRange(NumFiles, col("zv"))
          .sortWithinPartitions("zv")
          .drop("zv")
          .write.mode("overwrite").parquet(tmpDir.toString)
        fs.delete(dir, true)
        if (!fs.rename(tmpDir, dir))
          throw new java.io.IOException(s"swap $tmpDir -> $dir failed")
      } finally spark.conf.set(tsTypeKey, prev)
    }
    // file-level stats manifest: one row of per-file min/max envelopes,
    // collected with ONE Spark job over the written layout and stored
    // beside it — the metadata layer a table format would keep. Rebuilt
    // whenever the layout was rebuilt or a layout predates the manifest.
    val mDir = manifestPath(spark, sfDir)
    val mSuccess = new Path(mDir, "_SUCCESS")
    if (!lastEnsureWasCacheHit ||
        mtimeOf(fs, mSuccess) < mtimeOf(fs, success)) {
      // same tmp+swap discipline as the layout build
      val mTmp = new Path(root, clusterDirName(sfDir) +
        s"_manifest_build_p${graft.util.Scratch.procToken}")
      spark.read.parquet(dir.toString)
        .groupBy(input_file_name().as("file"))
        .agg(
          min("l_shipdate").as("ship_min"), max("l_shipdate").as("ship_max"),
          min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"))
        .coalesce(1).write.mode("overwrite")
        .parquet(mTmp.toString)
      fs.delete(mDir, true)
      if (!fs.rename(mTmp, mDir))
        throw new java.io.IOException(s"swap $mTmp -> $mDir failed")
    }
    dir.toString
  }

  private def manifestPath(spark: SparkSession, sfDir: String): Path =
    new Path(graft.util.Scratch.root(spark), clusterDirName(sfDir) + "_manifest")

  /** The clustered copy as a DataFrame. */
  def clusteredLineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(ensureClustered(spark, sfDir))

  /** Returnflag revenue profile of one (shipdate × partkey) rectangle,
    * served from the clustered layout — both predicates reach the parquet
    * scan as pushed filters and every tile outside the rectangle is
    * skipped. Decimal-exact money, doubles only at the edge.
    */
  def clusteredRectRevenue(spark: SparkSession, sfDir: String): DataFrame =
    rectRevenue(clusteredLineitem(spark, sfDir))

  /** Rectangle bounds — inside the corpus's actual shipdate range
    * (1995-01-02 … 2001-11-04) and partkey range (0 … 200k·SF). TYPED
    * timestamp literals: l_shipdate is a TimestampType column, and a
    * string literal would be compared through a cast that blocks parquet
    * filter pushdown — the exact scan-time skip this layout exists for.
    */
  private[graft] val RectLo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
  private[graft] val RectHi = java.sql.Timestamp.valueOf("1996-06-30 23:59:59")

  /** The rectangle query with PLANNING-time file pruning — the catalog
    * analogue of the reference's per-letter directory names
    * (`/root/reference/helper_reduce.c:238-242`: the file NAME encodes the
    * key range, so serving opens one of 26 files without reading any).
    * Row-group skipping ([[clusteredRectRevenue]]) still opens every file's
    * footer; here the driver consults the stats manifest (one row per
    * file — KBs at this layout's file counts, the same metadata:data ratio
    * a table format keeps at 100 TB), keeps only files whose min/max
    * envelope intersects the rectangle, and hands the parquet reader a
    * file list that never mentions the rest. ClusteringSpec asserts the
    * scan's numFiles metric drops below the layout's file count while the
    * result stays identical.
    */
  def prunedRectRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureClustered(spark, sfDir)
    val keep = spark.read.parquet(manifestPath(spark, sfDir).toString)
      .where(col("ship_max") >= lit(RectLo) && col("ship_min") <= lit(RectHi)
        && col("pk_max") >= 1 && col("pk_min") <= 100)
      .select("file")
      .collect().map(_.getString(0)) // one row per file: this IS the metadata layer
    if (keep.isEmpty)
      rectRevenue(spark.read.parquet(dir).where(lit(false)))
    else
      rectRevenue(spark.read.parquet(keep.toIndexedSeq: _*))
  }

  /** The same query shape over any lineitem-schema frame (shared by the
    * spec's clustered-vs-plain comparison).
    */
  private[graft] def rectRevenue(li: DataFrame): DataFrame =
    li.where(col("l_shipdate").between(lit(RectLo), lit(RectHi))
        && col("l_partkey").between(1, 100))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
}
