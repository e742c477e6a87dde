package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.FunctionRegistryBridge

import graft.functions.{CosineSimilarity, PolyFold64, PolyHash}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works like any built-in —
  * the (c) rung of the custom-operator ladder
  * (SparkSessionExtensions-based integration).
  *
  * Two entry points:
  *  - config: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (applies to every session the driver builds);
  *  - programmatic: [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // layout-aware partition-predicate injection for the index schema
    ext.injectOptimizerRule(_ => graft.plans.LetterPruningRule)
    // physical planning for the native as-of join operator
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  /** (identifier, info, builder) triples for every graft SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes two arguments")
        CosineSimilarity(args.head, args(1))
      }),
    (new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_hash(s) takes one argument")
        PolyHash(args.head)
      }),
    (new FunctionIdentifier("poly_fold64"),
      new ExpressionInfo(classOf[PolyFold64].getName, "poly_fold64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_fold64(s) takes one argument")
        PolyFold64(args.head)
      }),
    (new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[graft.functions.KmvSketchAgg].getName,
        "kmv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_sketch(h, k) takes two arguments")
        val k = args(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "kmv_sketch: k must be a literal")
        }
        graft.functions.KmvSketchAgg(args.head, k)
      }),
    (new FunctionIdentifier("kmv_hashes"),
      new ExpressionInfo(classOf[graft.functions.KmvHashesAgg].getName,
        "kmv_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_hashes(h, k) takes two arguments")
        val k = args(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "kmv_hashes: k must be a literal")
        }
        graft.functions.KmvHashesAgg(args.head, k)
      }),
    (new FunctionIdentifier("bottomk_sketch"),
      new ExpressionInfo(classOf[graft.functions.BottomKSketchAgg].getName,
        "bottomk_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "bottomk_sketch(h, v, k) takes three arguments")
        val k = args(2) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "bottomk_sketch: k must be a literal")
        }
        graft.functions.BottomKSketchAgg(args.head, args(1), k)
      }))

  /** Register every graft function into a live session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, b) =>
      FunctionRegistryBridge.register(spark, id, info, b)
    }
}
