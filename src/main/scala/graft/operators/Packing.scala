package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** SEQUENCE PACKING — the final shape of a pretraining data pipeline:
  * concatenate every document (plus one EOS sentinel token each) in
  * deterministic doc_id order and chunk the stream into fixed-size
  * context windows. The packing itself is a pure function of per-doc
  * token counts and a global prefix sum; no text moves.
  *
  * The global prefix sum is the scale problem: a single
  * `Window.orderBy(doc_id)` serializes the whole corpus through one
  * partition. Instead it runs TWO-PHASE, the classic distributed scan:
  * docs land in doc_id-range buckets, each bucket computes its LOCAL
  * running sum in parallel (window partitioned by bucket), and the
  * per-bucket totals — `nBuckets` rows, metadata-sized — get their own
  * cumulative offsets on a tiny frame that is broadcast back. At 1000
  * executors the only serial step is the nBuckets-row scan.
  */
object Packing {

  /** (doc_id, n_tokens) token counts of a corpus slice (+1 EOS each). */
  private[graft] def countsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (size(tokens(col("text"))) + 1).cast("long").as("n_tokens"))

  /** Per-doc packing manifest: (doc_id, n_tokens, start_off, first/last
    * window) — `contextLen`-token windows over the EOS-joined stream.
    */
  private[graft] def packManifest(spark: SparkSession, sfDir: String,
                                      contextLen: Int,
                                      nBuckets: Int = 32): DataFrame =
    manifestOfCounts(countsOf(Tables.documents(spark, sfDir)),
      contextLen, nBuckets, baseOffset = 0L)

  /** The manifest over an explicit (doc_id, n_tokens) relation, with
    * every offset shifted by `baseOffset` — the hook that makes packing
    * INCREMENTALLY MAINTAINABLE: an append-only delta (all doc_ids above
    * the packed base) packs against the base's persisted total token
    * count without touching the base manifest.
    */
  private[graft] def manifestOfCounts(docs: DataFrame, contextLen: Int,
                                      nBuckets: Int,
                                      baseOffset: Long): DataFrame = {
    // doc_ids are dense from 0 (TESTDATA.md), so fixed-width ranges keep
    // buckets balanced AND doc_id-ordered; the max-id lookup is one scalar
    val maxId = docs.agg(max(col("doc_id"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val bSize = math.max(1L, maxId / nBuckets + 1)
    val bucketed = docs.withColumn("bucket", expr(s"doc_id div $bSize"))
    val localCum = bucketed.withColumn("local_cum",
      sum(col("n_tokens")).over(
        Window.partitionBy("bucket").orderBy("doc_id")) - col("n_tokens"))
    val bucketTotals = bucketed.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("btot"))
    val bucketOffsets = bucketTotals.withColumn("boff",
      coalesce(sum(col("btot")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bucket", "boff")
    localCum.join(broadcast(bucketOffsets), "bucket")
      .withColumn("start_off", col("boff") + col("local_cum") + baseOffset)
      // `div`, not `/`: Column./ is true division (double) on longs
      .withColumn("first_window", expr(s"start_off div $contextLen"))
      .withColumn("last_window",
        expr(s"(start_off + n_tokens - 1) div $contextLen"))
      .select("doc_id", "n_tokens", "start_off", "first_window", "last_window")
  }

  /** Packing REPORT: how many context windows hold how many (partial or
    * whole) documents — the fill-fragmentation histogram a data engineer
    * reads before a training run (a long docs_in_window tail means the
    * context length fragments documents; a fat docs_in_window=1 bucket at
    * small counts means padding waste in unpacked loaders). One explode
    * of each doc into the windows it touches (total rows =
    * n_docs + n_windows − 1, linear), two small aggregations.
    */
  def packingHistogram(spark: SparkSession, sfDir: String,
                       contextLen: Int = 512): DataFrame =
    packManifest(spark, sfDir, contextLen)
      .select(explode(sequence(col("first_window"), col("last_window")))
        .as("window_id"))
      .groupBy("window_id").agg(count(lit(1)).as("docs_in_window"))
      .groupBy("docs_in_window").agg(count(lit(1)).as("n_windows"))
      .orderBy("docs_in_window")

  /** Packing SUMMARY: corpus-level invariants of the same manifest —
    * total token stream length, window count, boundary-splitting doc
    * count, and the exact fill of the final (only non-full) window.
    */
  private def summaryOfManifest(manifest: DataFrame,
                                contextLen: Int): DataFrame =
    manifest
      .agg(
        sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("last_window") > col("first_window"), 1L).otherwise(0L))
          .as("n_split_docs"),
        (max(col("last_window")) + 1).as("n_windows"))
      .withColumn("last_fill",
        col("total_tokens") - (col("n_windows") - 1) * contextLen)

  def packingSummary(spark: SparkSession, sfDir: String,
                     contextLen: Int = 512): DataFrame =
    summaryOfManifest(packManifest(spark, sfDir, contextLen), contextLen)

  /** TRAINING-SHARD MANIFEST — output-file planning for the corpus
    * export: documents are assigned WHOLE (doc-atomic, unlike the
    * window packing above) to contiguous shards of ~`budgetTokens`
    * tokens each — shard = start_off div budget over the same EOS-padded
    * token stream the packer uses, so shard sizes hover around the
    * budget (one doc of overshoot max) and every shard is a contiguous
    * doc_id range (the manifest proves it via first/last doc). This is
    * how the export writer gets byte-balanced files WITHOUT a global
    * sort: the offsets ride the same two-phase distributed prefix sum,
    * and the report is shard-count-sized.
    */
  /** q_padding_report: DYNAMIC-BATCHING efficiency — the inference-side
    * companion of training-side packing. A serving tier that pads every
    * sequence to the global max wastes Σ(max − len) token slots; bucketed
    * batching pads only to the next multiple of `mult` (the bucket its
    * batch is built from). This report quantifies that choice per bucket:
    * docs, real tokens, padding under bucketed batching, padding under
    * naive global-max padding. All integer arithmetic (exact on any
    * engine); the only non-local input is the one-row global max, which
    * broadcasts; the bucket rollup is one partially-aggregated exchange
    * of bucket cells at any corpus size.
    */
  def paddingReport(spark: SparkSession, sfDir: String,
                    mult: Int = 16): DataFrame = {
    // ONE corpus pass: both padding totals are linear in the bucket
    // aggregates — pad_bucketed = bucket_len·n − Σlen and
    // pad_naive = g·n − Σlen with g = max over the bucket table. A
    // second declarative consumer of the bucket relation would re-run
    // the regexp tokenize (column pruning breaks subtree identity, the
    // repo's documented multi-consumer issue), so the METADATA-SIZED
    // bucket table (≤ max-doc-len/mult rows at any corpus size) collects
    // once and the report derives locally — the q_pca_top precedent.
    import spark.implicits._
    val buckets = Tables.documents(spark, sfDir)
      .select(size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket_len",
        expr(s"((n_tokens + ${mult - 1}) div $mult) * $mult"))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .as[(Long, Long, Long, Long)].collect()
    val g = if (buckets.isEmpty) 0L else buckets.map(_._4).max
    buckets.toSeq.sortBy(_._1)
      .map { case (b, n, s, _) => (b, n, s, b * n - s, g * n - s) }
      .toDF("bucket_len", "n_docs", "n_tokens", "pad_bucketed", "pad_naive")
  }

  def shardManifest(spark: SparkSession, sfDir: String,
                    budgetTokens: Long = 8192): DataFrame =
    manifestOfCounts(countsOf(Tables.documents(spark, sfDir)),
      contextLen = 1, nBuckets = 32, baseOffset = 0L)
      .withColumn("shard_id", expr(s"start_off div $budgetTokens"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard_id")

  /** INCREMENTAL packing maintenance — why the manifest formulation
    * matters at 100 TB: a crawl append (all new doc_ids above the packed
    * base) extends the token stream at its END, so the delta packs
    * against ONE persisted scalar (the base's total token count) and the
    * base manifest is never touched or re-read beyond that scalar. This
    * query splits the corpus at the midpoint id, packs the base, packs
    * the delta with `baseOffset` = the base's total, and summarizes the
    * CONCATENATED manifest — the driver's oracle checks it against the
    * monolithic full-corpus packing, proving append ≡ re-pack.
    */
  def packingSummaryIncremental(spark: SparkSession, sfDir: String,
                                contextLen: Int = 512): DataFrame = {
    val counts = countsOf(Tables.documents(spark, sfDir))
    val maxId = counts.agg(max(col("doc_id"))).head().getLong(0)
    val split = maxId / 2
    val base = manifestOfCounts(counts.filter(col("doc_id") <= split),
      contextLen, 32, baseOffset = 0L)
    // the one scalar a real pipeline persists between crawl batches
    val baseTotal = base.agg(sum(col("n_tokens"))).head().getLong(0)
    val delta = manifestOfCounts(counts.filter(col("doc_id") > split),
      contextLen, 32, baseOffset = baseTotal)
    summaryOfManifest(base.unionByName(delta), contextLen)
  }
}
