package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file BLOOM-FILTER data skipping — the metadata layer min/max
  * envelopes cannot provide. The Z-layout ([[Clustering]]) organizes
  * lineitem by (shipdate, partkey), so a point lookup on the UNRELATED
  * `l_orderkey` gets no help from the stats manifest: every file's
  * min/max envelope spans the whole key range and the scan opens all
  * [[Clustering.NumFiles]] files. Table formats solve exactly this with
  * per-file Bloom bitsets (Parquet bloom_filter, Delta/Iceberg file
  * skipping): ~32 KB of bits per file answers "can this key be here?"
  * with no false negatives, so planning keeps only the files that might
  * contain the key — at 100 TB that is the difference between opening
  * thousands of footers and a handful.
  *
  * The manifest is one relation (file, word, bits): BloomBits/64 packed
  * longs per file, built with ONE aggregation over the layout (per-file
  * distinct keys → k positions each → `bit_or` word fold) and stored
  * beside the layout in the scratch root, rebuilt whenever the layout is
  * (same staleness rule as the stats manifest). Probe positions use
  * Kirsch–Mitzenmacher double hashing h1 + i·h2 with exact
  * DECIMAL(38,0) multiplies ([[graft.functions.HashFunctions]]'s
  * overflow discipline), and the driver computes the SAME positions for
  * the literal key ([[probePositions]]), so the k probe (word, mask)
  * pairs semi-join the manifest — the only driver-side collect is the
  * surviving file list, which IS the metadata layer.
  *
  * The query RESULT is bloom-invariant (no false negatives), so the
  * oracle is the plain point-lookup SQL; BloomSkipSpec pins the skipping
  * itself (candidate files ⊇ true files, and strictly fewer than the
  * layout's file count).
  */
object BloomSkip {

  val BloomBits: Long = 1L << 18 // 32 KB of bits per file
  val NumHashes = 4
  private val H1 = 2654435761L // Knuth multiplicative
  private val H2 = 2246822519L // xxhash prime 2
  private val M31 = 1L << 31

  /** k probe bit positions of a key column — exact arithmetic, mirrored
    * bit-for-bit by [[probePositions]] on the driver.
    *
    * FAST PATH (nonnegative keys — every TPC-H key): (key·H) mod 2^31
    * reduces the key mod 2^31 FIRST — (a·b) mod m = ((a mod m)·b) mod m —
    * so the product is bounded by (2^31−1)·H2 ≈ 4.8e18 < Long.MaxValue
    * and runs as three codegen'd integer ops per hash instead of a
    * DECIMAL(38,0) multiply/modulo (the [[graft.functions.HashFunctions]]
    * split-product discipline; the decimal form was the manifest build's
    * hottest expression — ~2.4M BigDecimal multiplies per build at sf0.1).
    * Negative keys (impossible by schema, guarded anyway) keep the exact
    * decimal form, preserving its sign-of-dividend semantics; positions
    * are VALUE-IDENTICAL across paths, so existing manifests stay valid.
    */
  private def posExprs(key: Column): Seq[Column] = {
    val m31mask = 2147483647L // 2^31 − 1
    val a = key.bitwiseAND(lit(m31mask)) // key mod 2^31 for key ≥ 0
    def h(c: Long, general: Column) =
      when(key >= 0, (a * c).bitwiseAND(lit(m31mask))).otherwise(general)
    val h1 = h(H1, ((key.cast("decimal(38,0)") * H1) % M31).cast("long"))
    val h2 = h(H2, ((key.cast("decimal(38,0)") * H2) % M31).cast("long"))
      .bitwiseOR(1L)
    (0 until NumHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(BloomBits)))
  }

  /** Driver twin of [[posExprs]] for the literal probe key. */
  private[graft] def probePositions(key: Long): Seq[Long] = {
    val h1 = (BigInt(key) * H1 % M31).toLong
    val h2 = (BigInt(key) * H2 % M31).toLong | 1L
    (0 until NumHashes)
      .map(i => (((h1 + i * h2) % BloomBits) + BloomBits) % BloomBits)
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def mtimeOf(fs: FileSystem, p: Path): Long =
    if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else -1L

  /** True when the last [[ensureBloom]] served a still-fresh manifest
    * (possibly written by an earlier JVM into the shared scratch root)
    * instead of building — lets the bench disclose a near-zero build
    * entry honestly, like Clustering.lastEnsureWasCacheHit.
    */
  @volatile var lastEnsureWasCacheHit: Boolean = false

  /** Build (or reuse) the per-file Bloom manifest over l_orderkey for the
    * clustered layout. Rebuilt whenever the layout's _SUCCESS is newer.
    */
  def ensureBloom(spark: SparkSession, sfDir: String): String = {
    val layout = Clustering.ensureClustered(spark, sfDir)
    val dir = new Path(graft.util.Scratch.root(spark),
      "graft_lineitem_bloom_" + graft.util.Scratch.valueToken(sfDir))
    val fs = fsOf(spark, dir)
    val layoutSuccess = new Path(layout, "_SUCCESS")
    lastEnsureWasCacheHit = mtimeOf(fs, new Path(dir, "_SUCCESS")) >=
      mtimeOf(fsOf(spark, layoutSuccess), layoutSuccess)
    if (!lastEnsureWasCacheHit) {
      val tmp = new Path(graft.util.Scratch.root(spark),
        "graft_lineitem_bloom_" + graft.util.Scratch.valueToken(sfDir) +
          s"_build_p${graft.util.Scratch.procToken}")
      spark.read.parquet(layout)
        .select(input_file_name().as("file"), col("l_orderkey"))
        .distinct() // per-file key SET — dups add no bits, just explode volume
        .select(col("file"),
          explode(array(posExprs(col("l_orderkey")): _*)).as("pos"))
        .select(col("file"), shiftright(col("pos"), 6).as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
        .groupBy("file", "word")
        .agg(expr("bit_or(mask)").as("bits"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // tmp+swap (same discipline as Clustering.ensureClustered): a
      // concurrent reader of the shared manifest sees a complete
      // generation, never a mid-build dir
      fs.delete(dir, true)
      if (!fs.rename(tmp, dir))
        throw new java.io.IOException(s"swap $tmp -> $dir failed")
    }
    dir.toString
  }

  /** The files that might contain `key`: every probe bit set in the
    * file's Bloom words. No false negatives by construction; the handful
    * of strings returned is planning metadata, not data.
    */
  private[graft] def candidateFiles(spark: SparkSession, sfDir: String,
                                    key: Long): Seq[String] = {
    import spark.implicits._
    val probes = probePositions(key)
      .map(p => (p >> 6, 1L << (p & 63).toInt)).distinct
    spark.read.parquet(ensureBloom(spark, sfDir))
      .join(broadcast(probes.toDF("word", "mask")), "word")
      .where(col("bits").bitwiseAND(col("mask")) =!= 0)
      .groupBy("file").agg(count(lit(1)).as("hits"))
      .where(col("hits") === probes.size)
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Point lookup served through the Bloom manifest: the parquet reader
    * is handed only the surviving files. Output is bloom-invariant, so
    * the plain point-query SQL is the oracle.
    */
  def bloomPrunedLookup(spark: SparkSession, sfDir: String,
                        key: Long): DataFrame = {
    val layout = Clustering.ensureClustered(spark, sfDir)
    val keep = candidateFiles(spark, sfDir, key)
    val src =
      if (keep.isEmpty) spark.read.parquet(layout).where(lit(false))
      else spark.read.parquet(keep: _*)
    src.where(col("l_orderkey") === key)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_linenumber")
  }
}
