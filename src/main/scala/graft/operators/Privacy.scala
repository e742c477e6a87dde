package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Privacy / PII-hygiene operators for training-data curation: before a
  * corpus with user-linked records feeds a training run, identifier
  * columns get PSEUDONYMIZED (stable surrogate keys that still join),
  * free-text identifiers get MASKED (regex redaction), and quasi-
  * identifiers get GENERALIZED (coarse buckets, k-anonymity style).
  *
  * All three are pure row-local projections — no shuffle, fully
  * distributed, and deterministic so reruns/retries produce the identical
  * curated corpus:
  *  - pseudonym = Knuth multiplicative hash of the key (NOT reversible by
  *    join-free inspection, but stable, so downstream joins on the
  *    pseudonym still co-locate; a production system would key an HMAC
  *    with a secret — the plumbing is identical);
  *  - masking uses `regexp_replace` with an RE2-safe character class
  *    (no lookaround/backrefs), codegen'd by Catalyst;
  *  - generalization rounds the quasi-identifier down to its bucket floor
  *    in exact integer arithmetic.
  */
object Privacy {

  private val Knuth = 2654435761L
  private val M32 = 4294967296L

  /** Pseudonymize the customer table: surrogate key, digits masked out of
    * the name, account balance generalized to a 500-unit bucket floor,
    * market segment passed through (already categorical/coarse).
    */
  def pseudonymizeCustomers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        graft.functions.HashFunctions.knuthMod(col("c_custkey"), M32).as("pseudo_key"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("name_masked"),
        (floor(col("c_acctbal").cast("decimal(12,2)") / 500) * 500)
          .cast("long").as("acctbal_bucket"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  /** K-ANONYMITY release of the document corpus: every published row's
    * quasi-identifier combination (lang, source, size bucket) must be
    * shared by at least k rows — combinations rarer than k get their
    * quasi-identifiers SUPPRESSED to '*' (full generalization) instead of
    * being dropped, so corpus statistics keep every row. The equivalence-
    * class census is one aggregation over the tiny QI domain, joined back
    * broadcast; the release itself stays a row-local projection.
    */
  def kAnonymousRelease(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val qi = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        (floor(col("n_chars") / 500) * 500).cast("long").as("size_bucket"))
    val census = qi.groupBy(col("lang").as("g_lang"), col("source").as("g_source"),
        col("size_bucket").as("g_bucket"))
      .agg(count(lit(1)).as("class_size"))
    qi.join(broadcast(census),
        col("lang") === col("g_lang") && col("source") === col("g_source") &&
        col("size_bucket") === col("g_bucket"))
      .select(col("doc_id"),
        when(col("class_size") >= k, col("lang")).otherwise("*").as("lang"),
        when(col("class_size") >= k, col("source")).otherwise("*").as("source"),
        when(col("class_size") >= k, col("size_bucket").cast("string"))
          .otherwise("*").as("size_bucket"),
        (col("class_size") >= k).as("released"))
      .orderBy("doc_id")
  }

  /** Join-through-pseudonym proof: per-pseudonymized-customer order count
    * and revenue, never exposing the raw key in the output. The join
    * co-locates on the ORIGINAL key (pseudonyms are applied in the final
    * projection), so the plan is the ordinary orders⋈customer shuffle —
    * pseudonymization costs nothing extra at scale.
    */
  def ordersByPseudonym(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).as("revenue"))
      .select(
        graft.functions.HashFunctions.knuthMod(col("o_custkey"), M32).as("pseudo_key"),
        col("n_orders"),
        col("revenue").cast("double").as("revenue"))
      .orderBy("pseudo_key")
}
