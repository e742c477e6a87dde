package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Exact covariance statistics over the embedding corpus — the
  * preprocessing layer for whitening, drift detection, and PCA. The
  * same closed-form recipe as [[LinearModel]]: quantize once, reduce to
  * integer sufficient statistics, derive the real-valued answer at the
  * very end, so the distributed part is one pass of exact, mergeable,
  * order-independent sums (a double Σxᵢxⱼ would hash differently per
  * partitioning; these BIGINT/decimal moments cannot).
  *
  * Components are quantized to micro-units with `floor(x·1e6 + 0.5)` —
  * floor is exact on doubles, so Spark and any other engine (the DuckDB
  * oracle included) produce bit-identical grids. The d(d+1)/2 pair
  * products are generated ROW-LOCALLY by codegen'd array HOFs — the only
  * exchange carries the d²-cell partial sums (map-side combined), the
  * corpus never shuffles. Work is the inherent O(n·d²) of covariance;
  * the cell sums accumulate in decimal(38,0) so a 1e9-row corpus cannot
  * overflow them.
  */
object Covariance {

  /** The upper-triangle covariance grid: exact integer moments per dim
    * pair plus the derived population covariance (one double division of
    * exact integers, rounded at 6dp).
    */
  def covarianceGrid(spark: SparkSession, sfDir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val q = Tables.embeddings(spark, sfDir)
      .select(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT))")
        .as("q"))
    // the hot stream carries ONE struct of two longs per pair — the pair
    // identity packed as i·d+j and the product — NOT the (qi, qj) values:
    // the per-dim first moments are a d-cell side aggregation joined back
    // onto the d²-cell grid (both metadata-sized, broadcast), which keeps
    // the n·d²-row stage to the minimum bytes the algorithm needs
    val pairSums = q
      .select(size(col("q")).as("d"), explode(expr(
        """flatten(transform(sequence(0, size(q) - 1), i ->
          |  transform(sequence(i, size(q) - 1), j ->
          |    struct(i * size(q) + j AS idx, q[i] * q[j] AS qq))))""".stripMargin))
        .as("p"))
      .groupBy(expr("CAST(p.idx DIV d AS INT)").as("dim_i"),
        pmod(col("p.idx"), col("d")).cast("int").as("dim_j"))
      .agg(count(lit(1)).as("n"), sum(col("p.qq").cast(d38)).as("sij"))
    val dimSums = q
      .select(posexplode(col("q")).as(Seq("dim", "qv")))
      .groupBy(col("dim")).agg(sum(col("qv").cast(d38)).as("s"))
    pairSums
      .join(broadcast(dimSums.select(col("dim").as("dim_i"), col("s").as("si"))), "dim_i")
      .join(broadcast(dimSums.select(col("dim").as("dim_j"), col("s").as("sj"))), "dim_j")
      .select(col("dim_i"), col("dim_j"), col("n"),
        col("si").cast("long").as("s_i"),
        col("sj").cast("long").as("s_j"),
        col("sij").cast("long").as("s_ij"),
        round((col("n").cast(d38) * col("sij") - col("si") * col("sj"))
          .cast("double")
          / ((col("n") * col("n")).cast("double") * lit(1e12)), 6).as("cov"))
      .orderBy("dim_i", "dim_j")
  }

  /** Top principal component by power iteration. The covariance grid is
    * d(d+1)/2 rows — metadata-sized for any real embedding width — so
    * collecting it and iterating on the driver is the standard shape
    * (one distributed pass for the moments, O(d²) driver flops per
    * iteration, no further cluster work). Deterministic: fixed start
    * vector, fixed iteration count. Returns (unit eigenvector with a
    * sign convention — largest-|component| entry positive — and its
    * eigenvalue).
    */
  def pcaTopComponent(spark: SparkSession, sfDir: String,
                      iters: Int = 500): (Array[Double], Double) = {
    val rows = covarianceGrid(spark, sfDir)
      .select("dim_i", "dim_j", "cov").collect()
    val d = rows.map(_.getInt(0)).max + 1
    val a = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var lambda = 0.0
    for (_ <- 0 until iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      lambda = (0 until d).map(i => v(i) * w(i)).sum
      v = w.map(_ / norm)
    }
    val kMax = v.indices.maxBy(i => math.abs(v(i)))
    if (v(kMax) < 0) v = v.map(-_)
    (v, lambda)
  }
}
