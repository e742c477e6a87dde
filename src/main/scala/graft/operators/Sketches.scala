package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Mergeable frequency/membership sketches over the corpus vocabulary —
  * the bounded-memory summaries a 100 TB pipeline ships between stages
  * instead of the data itself (a CMS answers "how often?" in O(d·w), a
  * Bloom filter answers "seen before?" in m bits; both union across
  * shards by cellwise add / bitwise or).
  *
  * Everything here is a pure deterministic function of the data: bucket
  * hashing is the engine-exact polynomial fold
  * ([[graft.functions.HashFunctions.polyFold64]]) pushed through pairwise-
  * independent `(a·h + b) mod P` rows, so the DuckDB oracle reproduces
  * every cell, estimate, and membership bit — unlike Spark's built-in
  * CountMinSketch/BloomFilter aggregates, whose layouts are
  * implementation-specific and unverifiable across engines.
  *
  * The reference has no sketches — its closest analogue is the exact awk
  * count-by-term reduce (`/root/reference/helper_reduce.c:141-160`); these
  * are the sublinear summaries that replace exact counting when the
  * vocabulary no longer fits a reducer.
  */
object Sketches {

  private val P = 2147483647L // 2^31 − 1; (a·h' + b) stays well inside Int64

  /** Depth-row parameters: small odd multipliers/offsets, fixed so both
    * engines embed the same constants.
    */
  private val RowA = Seq(1L, 31L, 131L, 1031L)
  private val RowB = Seq(0L, 17L, 257L, 4099L)
  val Depth: Int = RowA.length

  /** Bucket of hash `h` in row `d` with `width` buckets — all arithmetic
    * mod P first so products never exceed 2^62. Exposed for the
    * streaming sketch maintainer. The inner `(h % P + P) % P`
    * normalization (mirroring [[bucketLit]]) keeps NEGATIVE keys — e.g.
    * a -1 sentinel user_id through the streaming CMS — in [0, P) so the
    * engine-side bucket always matches a driver-computed probe bucket;
    * Scala/SQL `%` both preserve the dividend's sign.
    */
  private[graft] def bucket(h: Column, d: Int, width: Int): Column =
    ((lit(RowA(d)) * ((h % P + P) % P) + lit(RowB(d))) % P) % width

  private[graft] def bucketLit(h: Long, d: Int, width: Int): Long =
    ((RowA(d) * (((h % P) + P) % P) + RowB(d)) % P) % width

  /** COUNT-MIN SKETCH estimate vs exact truth for a fixed probe-term set.
    *
    * Build: one pass over the (term, total-tf) relation — itself one
    * map-side-combined shuffle — exploding each term into its `Depth`
    * (row, bucket) cells and summing; the materialized sketch is
    * `Depth × width` cells regardless of corpus size. Serve: probe cells
    * are computed DRIVER-SIDE from the literal probe strings (the same
    * fold, [[HashFunctions.polyFold64Lit]]), so lookup touches `Depth`
    * cells per probe — the sketch table is broadcast-joined against the
    * tiny probe list, never shuffled. estimate = min over rows
    * (CMS guarantee: estimate ≥ truth, overshoot bounded by collisions
    * at ~N/width per row).
    */
  /** CMS cell table (d, bucket, cell) for a (term, n) count relation —
    * exposed so shard-merge specs and the streaming maintainer can build
    * cells over arbitrary subsets; sketches MERGE by cellwise sum.
    */
  private[graft] def cmsCells(termCounts: DataFrame, width: Int): DataFrame = {
    val h = HashFunctions.polyFold64(col("term"))
    termCounts
      .select(col("n"), posexplode(array(
        (0 until Depth).map(d => bucket(h, d, width)): _*)).as(Seq("d", "bucket")))
      .groupBy("d", "bucket").agg(sum(col("n")).as("cell"))
  }

  private[graft] def termCountsOf(docs: DataFrame): DataFrame =
    docs.select(explodedTokens(col("text")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))

  def cmsEstimate(spark: SparkSession, sfDir: String,
                  width: Int = 512,
                  probes: Seq[String] = DefaultProbes): DataFrame = {
    import spark.implicits._
    val termCounts = termCountsOf(Tables.documents(spark, sfDir))
    val cells = cmsCells(termCounts, width)
    val probeCells = probes.flatMap { t =>
      val ph = HashFunctions.polyFold64Lit(t)
      (0 until Depth).map(d => (t, d, bucketLit(ph, d, width)))
    }.toDF("term", "d", "bucket")
    val est = probeCells.join(cells, Seq("d", "bucket"), "left")
      .groupBy("term")
      // an empty cell means nothing hashed there: the row's count is 0
      .agg(min(coalesce(col("cell"), lit(0L))).as("cms_estimate"))
    // semi-join the corpus-scale counts down to the probe rows FIRST
    // (probes broadcast, map-side) — joining the 9-row estimate frame
    // left-outer against the full vocabulary would shuffle the vocabulary
    val exact = termCounts
      .join(broadcast(probes.toDF("term")), Seq("term"), "left_semi")
      .withColumnRenamed("n", "exact_count")
    est.join(exact, Seq("term"), "left")
      .select(col("term"), col("cms_estimate"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"))
      .orderBy("term")
  }

  /** BLOOM-FILTER membership audit for a fixed probe set.
    *
    * Build: the distinct vocabulary explodes into `Depth` bit positions
    * (same hash rows as the CMS, modulus `mBits`); the filter is the
    * DISTINCT position set — at most mBits rows, unioned across shards by
    * plain distinct. Serve: probe positions are driver-computed literals;
    * a probe is CLAIMED present iff all `Depth` of its bits are set.
    * Reported against ground truth, so false positives are visible as
    * claimed=1/actual=0 rows (false negatives are impossible — the audit
    * doubles as a correctness proof of the filter).
    */
  /** Bloom bit set (pos) of a term relation — exposed for shard-merge
    * specs; filters MERGE by distinct union (bitwise or).
    */
  private[graft] def bloomBits(vocab: DataFrame, mBits: Int): DataFrame = {
    val h = HashFunctions.polyFold64(col("term"))
    vocab
      .select(explode(array(
        (0 until Depth).map(d => bucket(h, d, mBits)): _*)).as("pos"))
      .distinct()
  }

  def bloomAudit(spark: SparkSession, sfDir: String,
                 mBits: Int = 65536,
                 probes: Seq[String] = DefaultProbes): DataFrame = {
    import spark.implicits._
    val vocab = Tables.documents(spark, sfDir)
      .select(explodedTokens(col("text")).as("term"))
      .distinct()
    val bits = bloomBits(vocab, mBits)
    val probeBits = probes.flatMap { t =>
      val ph = HashFunctions.polyFold64Lit(t)
      (0 until Depth).map(d => (t, bucketLit(ph, d, mBits)))
    }.toDF("term", "pos").distinct()
    val claimed = probeBits.join(bits, Seq("pos"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("n_set"))
    val nPos = probeBits.groupBy("term").agg(count(lit(1)).as("n_pos"))
    // ground truth via semi-join (probes broadcast, map-side) — a
    // left-outer against the corpus-scale vocabulary would shuffle it
    val actual = vocab
      .join(broadcast(probes.toDF("term")), Seq("term"), "left_semi")
      .withColumn("present", lit(1))
    nPos.join(claimed, Seq("term"), "left")
      .join(actual, Seq("term"), "left")
      .select(col("term"),
        (coalesce(col("n_set"), lit(0L)) === col("n_pos"))
          .cast("int").as("claimed_present"),
        coalesce(col("present"), lit(0)).as("actually_present"))
      .orderBy("term")
  }

  /** Probe mix: common terms, mid-frequency terms, and absent terms (the
    * absent ones are what exercise the CMS overshoot and Bloom
    * false-positive paths).
    */
  val DefaultProbes: Seq[String] = Seq(
    "the", "of", "and", "data", "system", "quick",
    "zyzzyva", "notaword", "qqqq")

  /** HISTOGRAM-percentile estimation vs exact truth — the approximate
    * quantile shape that actually works at 100 TB, where the exact
    * percentile's global sort is the bottleneck: one aggregation builds
    * a fixed equi-width bin table (`nBins` rows regardless of data
    * size, mergeable across shards by cellwise add), and each requested
    * percentile is answered by linear interpolation inside its crossing
    * bin. Everything is deterministic double arithmetic both engines
    * replay exactly — unlike percentile_approx, whose sketch is
    * implementation-specific. The cumulative window over the bin table
    * and the crossing-bin join both run on ≤ `nBins` rows —
    * metadata-sized, like the packing offsets frame. Exact truth rides
    * the same scan for the audit.
    */
  def histPercentiles(spark: SparkSession, sfDir: String,
                      nBins: Int = 1000,
                      pcts: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val v = Tables.events(spark, sfDir).select(col("value").as("v"))
    val stats = v.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
      count(lit(1)).as("n"),
      expr(s"percentile(v, array(${pcts.mkString(", ")}))").as("ex"))
    val hist = v.crossJoin(broadcast(stats))
      .withColumn("w", (col("vmax") - col("vmin")) / nBins)
      .withColumn("bin",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(floor((col("v") - col("vmin")) / col("w")),
            lit((nBins - 1).toLong)).cast("long")))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy("bin")))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val targets = pcts.zipWithIndex.map { case (p, i) => (i + 1, p) }
      .toDF("i", "p")
      .crossJoin(broadcast(stats))
      .select(col("p"), (col("p") * col("n")).as("tgt"),
        element_at(col("ex"), col("i")).as("exact_v"),
        col("vmin"), ((col("vmax") - col("vmin")) / nBins).as("w"))
    targets.join(cum,
        col("cum_before") < col("tgt") && col("tgt") <= col("cum"))
      .select(col("p"),
        round(col("vmin") + col("w") *
          (col("bin") + (col("tgt") - col("cum_before")) / col("cnt")), 4)
          .as("est_value"),
        round(col("exact_v"), 4).as("exact_value"),
        round(abs(col("vmin") + col("w") *
          (col("bin") + (col("tgt") - col("cum_before")) / col("cnt"))
          - col("exact_v")), 4).as("abs_err"))
      .orderBy("p")
  }
}
