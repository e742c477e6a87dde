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
  * Scale posture: ONE scan of the doc-METADATA relation (never text)
  * unpivots every (dimension, bin) pair row-locally, ONE aggregation
  * reduces it to the cell table (dimensions × bins rows — fixed-size,
  * like a sketch), and the PSI math runs on cells alone. The cell table
  * is also the STREAMING state of [[graft.streaming.StreamingDrift]] —
  * cellwise add is the monitor's merge operation, so the drained
  * streaming monitor is bit-identical to this batch one. Laplace (+1)
  * smoothing keeps every share positive so ln() is total, and makes the
  * cell math integer-derived — engine-exact up to the final round(…, 6).
  */
object Drift {

  /** Row-local (dimension, bin) unpivot of one document's metadata. */
  private[graft] def dimBins(charBin: Int): Column = explode(array(
    struct(lit("length").as("dimension"),
      expr(s"CAST((n_chars div $charBin) * $charBin AS STRING)").as("bin")),
    struct(lit("source").as("dimension"), col("source").as("bin")),
    struct(lit("lang").as("dimension"), col("lang").as("bin"))))

  /** (dimension, bin, a, b) cells → the per-dimension PSI report.
    * Everything here is cell-table-sized.
    */
  private[graft] def psiFromCells(cells: DataFrame): DataFrame = {
    val tot = cells.groupBy("dimension").agg(
      count(lit(1)).as("n_bins"),
      sum(col("a")).as("n_base"), sum(col("b")).as("n_new"))
    cells.join(broadcast(tot), "dimension")
      .select(col("dimension"), col("n_bins"), col("n_base"), col("n_new"),
        ((col("a") + 1).cast("double") /
          (col("n_base") + col("n_bins")).cast("double")).as("pa"),
        ((col("b") + 1).cast("double") /
          (col("n_new") + col("n_bins")).cast("double")).as("pb"))
      .withColumn("contrib", (col("pa") - col("pb")) * log(col("pa") / col("pb")))
      .groupBy(col("dimension"), col("n_bins"), col("n_base"), col("n_new"))
      .agg(round(sum(col("contrib")), 6).as("psi"))
      .select("dimension", "n_bins", "n_base", "n_new", "psi")
      .orderBy("dimension")
  }

  /** Per-generation cell counts from a gen-labeled metadata relation:
    * one scan, one aggregation.
    */
  private[graft] def cellsOf(labeled: DataFrame, charBin: Int): DataFrame =
    labeled.select(col("gen"), dimBins(charBin).as("dc"))
      .select(col("gen"), col("dc.dimension").as("dimension"),
        col("dc.bin").as("bin"))
      .groupBy("dimension", "bin")
      .agg(sum(when(col("gen") === "base", 1L).otherwise(0L)).as("a"),
        sum(when(col("gen") === "new", 1L).otherwise(0L)).as("b"))

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
    val labeled = docs.crossJoin(broadcast(half))
      .withColumn("gen",
        when(col("doc_id") <= col("half"), "base").otherwise("new"))
    psiFromCells(cellsOf(labeled, charBin))
  }
}
