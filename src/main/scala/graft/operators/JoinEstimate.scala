package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, KmvHashesAgg}
import graft.sources.Tables

/** SKETCH-BASED JOIN-SIZE ESTIMATION — the planning question every big
  * join asks before it runs: "how many rows will orders ⋈ lineitem
  * produce?", answered WITHOUT running the join. The estimator is the
  * KMV member-sample form of Vengerov-style sketch join estimation:
  *
  *  1. each side reduces to its k smallest distinct join-key hashes
  *     ([[graft.functions.KmvHashesAgg]] — map-side partial sketches,
  *     ≤ k longs per task cross the exchange; the hash is
  *     [[graft.functions.HashFunctions.knuth62Mod]] — a 62-bit
  *     golden-ratio multiplier, odd, so multiplication by it is a
  *     bijection mod 2^62 and key distinctness is preserved across the
  *     whole 62-bit id range. A 2^32 domain would merge keys differing
  *     only above bit 31 — exactly the id ranges a 100 TB corpus
  *     reaches — biasing est_keys/est_join_rows low; and the 32-bit
  *     multiplier mod 2^62 leaves small ids unwrapped, breaking the
  *     estimator's uniformity assumption outright);
  *  2. the union sketch K(A∪B) (array math on the two k-arrays) gives
  *     the key-universe estimate Û = (|K|−1)·2^62 / max(K);
  *  3. the union-sketch members are a uniform sample of the key
  *     universe, so their per-key row counts — fetched by a
  *     MEMBERS-ONLY probe (each side filtered to ≤ k hash literals, a
  *     map-side semi filter, then a ≤ k-row count) — extrapolate:
  *     |A ⋈ B|^ = Σ_{m ∈ K, m∈A∩B} cA(m)·cB(m) · Û / |K|.
  *
  * Nothing data-sized moves: two sketch passes + two members-only
  * probes. The exact join count is kept as the audit leg (the thing a
  * planner would NOT compute). Deterministic end-to-end — sketch,
  * probe, and estimator arithmetic reproduce bit-for-bit in the DuckDB
  * oracle.
  */
object JoinEstimate {

  // 2^62 sketch domain: see the bijection note in the class doc
  private val M62 = 4611686018427387904L

  /** One-row report: union-key estimate, estimated vs exact join rows,
    * relative error — for orders ⋈ lineitem on the order key.
    */
  def joinSizeEstimate(spark: SparkSession, sfDir: String,
                       k: Int = 256): DataFrame = {
    val oh = Tables.orders(spark, sfDir)
      .select(HashFunctions.knuth62Mod(col("o_orderkey")).as("h"))
    val lh = Tables.lineitem(spark, sfDir)
      .select(HashFunctions.knuth62Mod(col("l_orderkey")).as("h"))
    val sk = oh.agg(KmvHashesAgg.kmvHashes(col("h"), k).as("ka"))
      .crossJoin(lh.agg(KmvHashesAgg.kmvHashes(col("h"), k).as("kb")))
      .selectExpr("ka", "kb",
        s"slice(array_sort(array_distinct(concat(ka, kb))), 1, $k) AS ku")
    // member relation: ≤ k rows of (h, in_a, in_b)
    val members = sk.select(explode(col("ku")).as("h"),
      col("ka"), col("kb"))
      .select(col("h"),
        array_contains(col("ka"), col("h")).as("in_a"),
        array_contains(col("kb"), col("h")).as("in_b"))
    // members-only count probes: the semi filter is map-side (broadcast
    // of ≤ k hashes), the count table is ≤ k rows
    val ca = oh.join(broadcast(members.select("h")), "h")
      .groupBy("h").agg(count(lit(1)).as("c_a"))
    val cb = lh.join(broadcast(members.select("h")), "h")
      .groupBy("h").agg(count(lit(1)).as("c_b"))
    val est = members
      .join(ca, Seq("h"), "left").join(cb, Seq("h"), "left")
      .agg(count(lit(1)).as("k_union"), max("h").as("kth"),
        sum(when(col("in_a") && col("in_b"),
          col("c_a") * col("c_b")).otherwise(0L)).as("sample_rows"))
      .selectExpr("k_union", "sample_rows",
        s"CAST(floor((k_union - 1) * CAST($M62 AS DOUBLE) / CAST(kth AS DOUBLE) + 0.5) AS BIGINT) AS est_keys")
      .selectExpr("k_union", "sample_rows", "est_keys",
        "CAST(floor(CAST(sample_rows AS DOUBLE) * CAST(est_keys AS DOUBLE) / k_union + 0.5) AS BIGINT) AS est_join_rows")
    // audit leg: the exact join count the planner would NOT run
    val exact = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("exact_join_rows"))
    est.crossJoin(exact)
      .selectExpr("k_union", "est_keys", "sample_rows", "est_join_rows",
        "exact_join_rows",
        "round(abs(CAST(est_join_rows AS DOUBLE) - exact_join_rows) / exact_join_rows, 6) AS rel_err")
  }
}
