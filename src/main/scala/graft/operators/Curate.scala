package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** The composed end-to-end curation pipeline — what a training-data job
  * actually runs before tokenization: drop exact duplicates, drop near-
  * duplicate cluster losers, keep documents passing the quality gate.
  * Each stage is an already-verified operator; this is their composition
  * as ONE declarative plan, so Catalyst sees the whole pipeline (the
  * semi/anti joins reuse the materialized cluster labels and the corpus
  * is tokenized once).
  *
  * Keeper rules are deterministic (min doc_id per content hash / per
  * connected component), so the curated corpus is byte-stable across
  * reruns — a requirement for reproducible training runs.
  */
object Curate {

  /** Curated corpus: (doc_id, lang, n_tokens) of surviving documents.
    *
    *  - exact stage: keep the min doc_id per sha256(text);
    *  - near-dup stage: drop docs whose Jaccard-0.8 component labels them
    *    a non-minimum member ([[Dedup.dupClusters]]);
    *  - quality gate: token count within [minTokens, maxTokens].
    */
  def curateCorpus(spark: SparkSession, sfDir: String,
                   minTokens: Int = 10, maxTokens: Int = 5000): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val exactKeepers = Dedup.exactKeeperIds(spark, sfDir)
    val nearLosers = Dedup.dupClusters(spark, sfDir, 0.8)
      .filter(col("cluster_id") =!= col("doc_id")).select("doc_id")
    toks
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(nearLosers, Seq("doc_id"), "left_anti")
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .orderBy("doc_id")
  }

  /** V2 curation: [[curateCorpus]]'s dedup + length gates composed with
    * the CONTENT-quality signals — boilerplate share
    * ([[TextAnalysis.boilerplateRatio]]) and Gopher-style bigram
    * repetition ([[TextAnalysis.repetitionStats]]). Survivors carry their
    * gate signals, so a pipeline audit sees why each document passed.
    * Signal relations join on doc_id as LEFT joins with a 0.0 default:
    * a document too short to have shingles/bigrams has nothing to gate
    * on and passes (the length gate owns the too-short case). Still one
    * declarative plan — every stage is an already-oracle-verified
    * operator, and Catalyst plans the whole composition together.
    */
  def curateCorpusV2(spark: SparkSession, sfDir: String,
                     minTokens: Int = 10, maxTokens: Int = 5000,
                     maxBoiler: Double = 0.5,
                     maxDupBigram: Double = 0.08): DataFrame = {
    val boiler = TextAnalysis.boilerplateRatio(spark, sfDir)
      .select(col("doc_id"), col("boiler_ratio"))
    val rep = TextAnalysis.repetitionStats(spark, sfDir)
      .select(col("doc_id"), col("dup_bigram_ratio"))
    curateCorpus(spark, sfDir, minTokens, maxTokens)
      .join(boiler, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .withColumn("boiler_ratio", coalesce(col("boiler_ratio"), lit(0.0)))
      .withColumn("dup_bigram_ratio",
        coalesce(col("dup_bigram_ratio"), lit(0.0)))
      .filter(col("boiler_ratio") <= maxBoiler &&
        col("dup_bigram_ratio") <= maxDupBigram)
      .orderBy("doc_id")
  }
}
