package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** CLOSED-FORM DISTRIBUTED NAIVE BAYES — the language classifier a
  * curation pipeline trains over its own corpus in ONE aggregation pass.
  * Like [[LinearModel]]'s moments, multinomial NB's sufficient statistics
  * are plain mergeable counts: per-(class, term) token counts and
  * per-class document counts. One corpus scan materializes them; the
  * model (Laplace-smoothed log-likelihoods over the vocab × class grid),
  * the priors, and every later prediction batch are vocabulary-sized —
  * at 100 TB the training cost is the one token-stream exchange and the
  * serve cost is a token-stream ⋈ model join on term (broadcastable
  * whenever vocab × classes fits an executor).
  *
  * Engine parity (the reason this is DuckDB-oracle-checkable):
  *  - the statistics are exact BIGINT counts, order-independent;
  *  - the only floating-point step, ln(smoothed likelihood), is QUANTIZED
  *    per (term, class) to integer micro-nats ([[llqExpr]] — one shared
  *    SQL fragment both engines evaluate over identical integers), so a
  *    document's score is an exact BIGINT dot product of token counts
  *    and quantized log-likelihoods — no order-dependent double sums;
  *  - argmax ties break deterministically on (score DESC, class ASC).
  *
  * Split contract: the same Knuth multiplicative cut as
  * [[TextAnalysis.trainValTestSplit]], 80% train / 20% held out; unseen
  * test-time terms (outside the train vocabulary) are ignored, the
  * standard multinomial treatment, and a test doc with NO in-vocabulary
  * tokens still scores on priors alone.
  *
  * Reference scope: the reference engine (map-reduce-indexing) stops at
  * counting (`helper_map.c:166`, `helper_reduce.c:153`); this derives a
  * trained classifier from the same count shapes.
  */
object NaiveBayes {

  /** Quantized log-likelihood in integer MICRO-NATS over (n, tot, v):
    * round(ln((n+1)/(tot+V)) · 1e6). |llq| ≤ ~21e6 for any real corpus
    * (a 1e-9 probability is −20.7 nats), so k·llq summed over a
    * million-token document stays far inside int64.
    */
  private[graft] val llqExpr =
    "CAST(round(ln(CAST(n + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE)) * 1000000) AS BIGINT)"

  /** Quantized class-prior log-probability over (n_docs, n_train). */
  private[graft] val priorExpr =
    "CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n_train AS DOUBLE)) * 1000000) AS BIGINT)"

  private val TrainPct = 80

  /** Documents with the Knuth-hash train flag (98/1/1 sibling: the
    * split rule is the oracle-identical integer form).
    */
  private def labeled(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"),
        (HashFunctions.knuthMod(col("doc_id"), 4294967296L) % 100 < TrainPct)
          .as("is_train"))

  /** Materialize the sufficient statistics — (lang, term, n) token counts
    * over the TRAIN split — once per corpus STATE: the single corpus-sized
    * pass. Model grid, vocab size, class totals, and the predict join all
    * read this vocabulary-sized parquet instead of re-tokenizing the
    * corpus. Keyed on the corpus listing signature
    * ([[graft.util.Scratch.memoizedDir]]) so a mutated corpus retrains
    * instead of scoring fresh documents against a stale model.
    */
  private[graft] def ensureTrainCounts(spark: SparkSession, sfDir: String): String =
    graft.util.Scratch.memoizedDir(spark,
      "graft_nb_counts_" + graft.util.Scratch.valueToken(sfDir),
      Tables.listingSig(Tables.documents(spark, sfDir))) { path =>
      labeled(spark, sfDir)
        .where(col("is_train"))
        .select(col("lang"), explode(tokens(col("text"))).as("term"))
        .groupBy("lang", "term")
        .agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(path)
    }

  /** Materialize the model GRID — Laplace-smoothed quantized
    * log-likelihoods on the full vocab × class grid (zeros filled in, so
    * unseen-in-class terms carry their smoothed penalty) — once per corpus
    * state, same memo key as the counts it derives from. The grid is the
    * dimension side of every scoring join, and that join routes through
    * [[JoinPlanner.measuredSide]], whose `count()` pre-pass would otherwise
    * EXECUTE the grid plan once for the measurement and once for the join
    * (the r15 NB serve regression): off a parquet artifact the pre-pass is
    * a footer-count scan that reads zero columns, and the join reads the
    * files once.
    */
  private[graft] def ensureModelGrid(spark: SparkSession, sfDir: String): String =
    graft.util.Scratch.memoizedDir(spark,
      "graft_nb_grid_" + graft.util.Scratch.valueToken(sfDir),
      Tables.listingSig(Tables.documents(spark, sfDir))) { path =>
      val cnt = spark.read.parquet(ensureTrainCounts(spark, sfDir))
      val tot = cnt.groupBy("lang").agg(sum("n").as("tot"))
      val vn = cnt.select("term").distinct().agg(count(lit(1)).as("v"))
      cnt.select("term").distinct()
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(vn))
        .join(cnt, Seq("term", "lang"), "left")
        .select(col("lang"), col("term"), coalesce(col("n"), lit(0L)).as("n"),
          col("tot"), col("v"))
        .select(col("lang"), col("term"), col("n"), expr(llqExpr).as("llq"))
        .write.mode("overwrite").parquet(path)
    }

  /** The trained model relation, served from the materialized grid. */
  private[graft] def modelGrid(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(ensureModelGrid(spark, sfDir))

  /** Quantized class priors from train DOC counts (a metadata-sized
    * aggregate — the text column is never read).
    */
  private[graft] def priors(spark: SparkSession, sfDir: String): DataFrame = {
    val perClass = labeled(spark, sfDir).where(col("is_train"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    perClass
      .crossJoin(broadcast(perClass.agg(sum("n_docs").as("n_train"))))
      .select(col("lang"), col("n_docs"), expr(priorExpr).as("prior_llq"))
  }

  /** q_nb_train: the trained model table. */
  def nbTrain(spark: SparkSession, sfDir: String): DataFrame =
    modelGrid(spark, sfDir).orderBy("lang", "term")

  /** Per-test-doc class scores: prior + Σ k·llq over the doc's
    * in-vocabulary terms (exact BIGINT arithmetic end to end). The dot
    * product needs no (doc, term) pre-aggregation: summing llq once per
    * token OCCURRENCE is identical to k·llq per distinct term, so the
    * token stream joins the model grid and partial aggregation collapses
    * it map-side — the only data-sized exchange carries pre-combined
    * (doc, class) partials. The vocab × classes grid is unbounded at
    * corpus scale, so the broadcast decision is MEASURED
    * ([[JoinPlanner.measuredSide]]): under the threshold the grid ships
    * to every executor, over it the same plan shuffles on term instead
    * of OOMing the executors with a forced hint.
    */
  private[graft] def scores(spark: SparkSession, sfDir: String): DataFrame = {
    val te = labeled(spark, sfDir).where(!col("is_train"))
    val tokScores = JoinPlanner.measuredJoinUsing(
      te.select(col("doc_id"), explode(tokens(col("text"))).as("term")),
      modelGrid(spark, sfDir), Seq("term"))
      .groupBy(col("doc_id"), col("lang").as("cls"))
      .agg(sum(col("llq")).as("tok_llq"))
    te.select(col("doc_id"), col("lang").as("actual"))
      .crossJoin(broadcast(priors(spark, sfDir)
        .select(col("lang").as("cls"), col("prior_llq"))))
      .join(tokScores, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("actual"), col("cls"),
        (col("prior_llq") + coalesce(col("tok_llq"), lit(0L))).as("score"))
  }

  /** q_nb_predict: argmax class per held-out doc, with the true label
    * alongside. Deterministic tie-break (score DESC, class ASC).
    */
  def nbPredict(spark: SparkSession, sfDir: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls").asc)
    scores(spark, sfDir)
      .withColumn("rn", row_number().over(byDoc))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("predicted"), col("actual"),
        col("score"))
      .orderBy("doc_id")
  }

  /** q_nb_auc: one-vs-rest ROC-AUC per class, EXACTLY — AUC is a rank
    * statistic, and the scores are integers, so it reduces to integer
    * rank sums with tie groups averaged: per (class, score) cell, the
    * doubled average rank of its members is 2·cum_before + cnt + 1,
    * giving S2 = Σ np·(2·cumb + cnt + 1) and
    * AUC = (S2 − P(P+1)) / (2·P·N) — every term a BIGINT off one
    * aggregation and a per-class running sum over DISTINCT score cells
    * (score-group-sized, not doc-sized), then ONE double division
    * rounded at 6dp. No sampling, no float rank jitter — the metric is
    * as exact as the model.
    */
  def nbAuc(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = scores(spark, sfDir)
      .select(col("cls"), col("score"),
        when(col("actual") === col("cls"), 1L).otherwise(0L).as("pos"))
    val g = sc.groupBy("cls", "score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("np"))
    val w = Window.partitionBy("cls").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .groupBy("cls")
      .agg(sum("np").as("p"),
        (sum("cnt") - sum("np")).as("n"),
        sum(col("np") * (lit(2L) * col("cumb") + col("cnt") + lit(1L)))
          .as("s2"))
      .where(col("p") > 0 && col("n") > 0)
      .select(col("cls"), col("p"), col("n"), col("s2"),
        round((col("s2") - col("p") * (col("p") + lit(1L))).cast("double")
          / (lit(2.0) * col("p").cast("double") * col("n").cast("double")), 6)
          .as("auc"))
      .orderBy("cls")
  }

  /** q_nb_confusion: the held-out confusion matrix — class × class
    * counts, the classifier's quality surface in one tiny table.
    */
  def nbConfusion(spark: SparkSession, sfDir: String): DataFrame =
    nbPredict(spark, sfDir)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
}
