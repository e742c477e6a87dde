package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarityExpr.cosineNative
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Similarity search over the embeddings table (SURVEY.md §2.2).
  *
  * Two paths:
  *  - [[cosineTopK]]: brute-force exact top-k — the small-query-set
  *    baseline. The query side is broadcast, so the corpus is scanned once
  *    with no shuffle of the big side; per (query, corpus) pair one
  *    codegen'd double-precision cosine.
  *  - [[annTopK]]: random-hyperplane LSH buckets — the 100 TB path. Each
  *    vector hashes to a small bucket id; candidates are only same-bucket
  *    pairs, so cost is ~linear in corpus size. Recall is probabilistic
  *    (tested against the brute-force baseline in SimilaritySpec).
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query vector (vec_id < nQueries),
    * excluding self-matches.
    */
  def cosineTopK(spark: SparkSession, sfDir: String,
                 nQueries: Int, k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("vec_id"))
    emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      // native codegen'd Expression — bit-identical to VectorFunctions.cosine
      // (same double arithmetic) but a zero-allocation primitive loop
      .withColumn("cosine", round(cosineNative(col("q_emb"), col("embedding")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "cosine", "rnk")
      .orderBy("query_id", "rnk")
  }

  // Deterministic random hyperplanes (seeded) for multi-table LSH:
  // NumTables independent tables of BitsPerTable sign bits each. Recall
  // comes from the union of candidates across tables; precision from the
  // exact cosine re-rank. Tune BitsPerTable ~ log2(corpusSize / desired
  // bucket size) at real scale.
  private val NumTables = 4
  private val BitsPerTable = 4
  private val Dim = 64
  private[operators] val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NumTables * BitsPerTable)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  // all hyperplanes as ONE typed literal (array<array<double>>): inlining
  // 16×64 scalar literals per reference bloats the plan and codegen —
  // a single literal + element_at keeps the expression tree tiny
  private lazy val planesLit: Column =
    typedlit(planes.map(_.toSeq).toSeq)

  /** Bucket id within table `t` = sign bits of the vector against that
    * table's hyperplanes (pure map-side; one shared literal plane array).
    * Bits accumulate as acc·2+bit — a deterministic bucket numbering.
    */
  private[operators] def bucketOf(v: Column, t: Int): Column =
    (0 until BitsPerTable).map { b =>
      val plane = element_at(planesLit, t * BitsPerTable + b + 1)
      when(dot(v, plane) >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One row per (vector, table) with its bucket id. */
  private def bucketed(df: DataFrame): DataFrame =
    df.select(col("*"),
        posexplode(array((0 until NumTables).map(t =>
          bucketOf(col("embedding"), t)): _*)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")

  /** Approximate top-k: candidates = union over LSH tables of same-bucket
    * vectors, re-ranked by exact cosine. Same output schema as
    * [[cosineTopK]]; recall vs the exact baseline is asserted in
    * SimilaritySpec.
    */
  def annTopK(spark: SparkSession, sfDir: String,
              nQueries: Int, k: Int): DataFrame = {
    val emb = bucketed(Tables.embeddings(spark, sfDir))
    val q = bucketed(Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < nQueries))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("tbl"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("vec_id"))
    emb.join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("q_emb"), col("embedding"))
      .distinct()                          // union candidates across tables
      .withColumn("cosine", round(cosineNative(col("q_emb"), col("embedding")), 6))
      .drop("q_emb", "embedding")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "cosine", "rnk")
      .orderBy("query_id", "rnk")
  }

  /** IVF-style ANN: coarse-quantize the corpus by nearest centroid
    * (deterministic centroid sample: every 29th vec_id), then each query
    * scans only its `nprobe` nearest cells, re-ranked by exact cosine.
    * The other classic scale path next to sign-LSH: cost ≈
    * nprobe/ncells of a full scan; centroids stay broadcastable (a real
    * deployment would k-means them — the sample keeps it deterministic
    * for the driver check).
    */
  def ivfTopK(spark: SparkSession, sfDir: String,
              nQueries: Int, k: Int, nprobe: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = emb.filter(pmod(col("vec_id"), lit(29)) === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(desc("sim"), col("cent_id"))
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("sim", cosineNative(col("embedding"), col("cent")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(desc("sim"), col("cent_id"))
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", cosineNative(col("q_emb"), col("cent")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cent_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("cosine"), col("vec_id"))
    assigned.join(broadcast(probes), "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(cosineNative(col("q_emb"), col("embedding")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id").as("query_id"), col("vec_id"), col("cosine"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Per-label embedding statistics: count + mean L2 norm. */
  def embedStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), l2Norm(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 4).as("avg_norm"))
      .orderBy("label")
}
