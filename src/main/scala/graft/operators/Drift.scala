package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** DISTRIBUTION-DRIFT MONITOR — the check a continuously-fed training
  * pipeline runs on every new crawl generation: has the incoming data's
  * distribution moved against the corpus it will join? Reported as the
  * Population Stability Index per monitored dimension
  * (PSI = Σ (p_base − p_new)·ln(p_base/p_new) over the dimension's bins;
  * credit-risk monitoring's standard drift score — <0.1 stable, >0.25
  * action). Dimensions here: document length (fixed-width char bins),
  * source mix, and language mix; the generation split is the same
  * midpoint-id convention the incremental-packing proof uses.
  *
  * Scale posture: each dimension is ONE aggregation of the doc-METADATA
  * relation down to its bin cells (never text), a 1-row totals
  * aggregate broadcast back, and a cell-count-sized PSI sum. Laplace
  * (+1) smoothing keeps every share positive so ln() is total, and makes
  * the cell math integer-derived — bit-identical across engines up to
  * the final round(…, 6).
  */
object Drift {

  /** One dimension's (gen, bin) rows → 1-row PSI report. */
  private def psiOf(binned: DataFrame, name: String): DataFrame = {
    val byBin = binned.groupBy("bin").agg(
      sum(when(col("gen") === "base", 1L).otherwise(0L)).as("a"),
      sum(when(col("gen") === "new", 1L).otherwise(0L)).as("b"))
    val tot = byBin.agg(count(lit(1)).as("n_bins"),
      sum(col("a")).as("n_base"), sum(col("b")).as("n_new"))
    byBin.crossJoin(broadcast(tot))
      .select(col("n_bins"), col("n_base"), col("n_new"),
        ((col("a") + 1).cast("double") /
          (col("n_base") + col("n_bins")).cast("double")).as("pa"),
        ((col("b") + 1).cast("double") /
          (col("n_new") + col("n_bins")).cast("double")).as("pb"))
      .withColumn("contrib", (col("pa") - col("pb")) * log(col("pa") / col("pb")))
      .groupBy("n_bins", "n_base", "n_new")
      .agg(round(sum(col("contrib")), 6).as("psi"))
      .select(lit(name).as("dimension"), col("n_bins"), col("n_base"),
        col("n_new"), col("psi"))
  }

  def distributionDrift(spark: SparkSession, sfDir: String,
                        charBin: Int = 64): DataFrame =
    driftOf(Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "n_chars"), charBin)

  /** The monitor over an explicit (doc_id, source, lang, n_chars)
    * relation — the spec feeds deliberately-shifted generations through
    * this to prove PSI actually trips.
    */
  private[graft] def driftOf(docs: DataFrame, charBin: Int): DataFrame = {
    val half = docs.agg(expr("max(doc_id) div 2").as("half"))
    val g = docs.crossJoin(broadcast(half))
      .withColumn("gen",
        when(col("doc_id") <= col("half"), "base").otherwise("new"))
    val dims: Seq[(String, Column)] = Seq(
      ("length", expr(s"(n_chars div $charBin) * $charBin").cast("string")),
      ("source", col("source")),
      ("lang", col("lang")))
    dims.map { case (name, bin) =>
      psiOf(g.select(col("gen"), bin.as("bin")), name)
    }.reduce(_.unionByName(_)).orderBy("dimension")
  }
}
