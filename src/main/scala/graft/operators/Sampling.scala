package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling operators for training-data curation.
  *
  * A 100 TB pipeline can't use `rand()`-based sampling for anything that
  * must be reproducible across reruns, retries, or engines: a retried task
  * would emit a different sample. Instead every decision here is a pure
  * function of the row key — a Knuth multiplicative hash
  * (h = id·2654435761 mod 2^32, Fibonacci hashing) — so the sample is
  * stable run-to-run, engine-exact (integer-only, reproducible in the
  * DuckDB oracle), and embarrassingly parallel: a pure map-side filter
  * with NO shuffle, which is the entire point at scale.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val M32 = 4294967296L

  /** h(id) mod 100 — a deterministic percentile bucket per row.
    * Valid for id < ~3.4e9 (id·Knuth must stay inside Int64; document ids
    * here are dense small ints, and a 100 TB corpus would hash a 64-bit id
    * with a wider mix instead).
    */
  private def pctBucket(id: org.apache.spark.sql.Column) =
    ((id * Knuth) % M32) % 100

  /** Stratified (per-language) Bernoulli sample: keep `pct(lang)`% of each
    * stratum, deterministically. Rebalances a skewed corpus (e.g. keep 25%
    * of dominant `en`, 60% of the rest) in one shuffle-free pass —
    * `sampleBy` semantics, minus the non-determinism.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
                       pctByLang: Map[String, Int],
                       defaultPct: Int): DataFrame = {
    val pct = pctByLang.foldLeft(lit(defaultPct)) { case (acc, (l, p)) =>
      when(col("lang") === l, lit(p)).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .filter(pctBucket(col("doc_id")) < pct)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Per-stratum sampling REPORT: achieved vs requested rate per language.
    * The per-stratum counts are the aggregation a curation job logs to
    * prove the rebalance landed; one partial-aggregated shuffle.
    */
  def stratifiedSampleStats(spark: SparkSession, sfDir: String,
                            pctByLang: Map[String, Int],
                            defaultPct: Int): DataFrame = {
    val pct = pctByLang.foldLeft(lit(defaultPct)) { case (acc, (l, p)) =>
      when(col("lang") === l, lit(p)).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .select(col("lang"), pct.as("req_pct"),
        (pctBucket(col("doc_id")) < pct).cast("int").as("kept"))
      .groupBy("lang", "req_pct")
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
      .withColumn("got_pct",
        round(col("n_kept") * 100.0 / col("n_total"), 4))
      .orderBy("lang")
  }
}
