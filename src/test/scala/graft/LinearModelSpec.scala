package graft

import org.apache.spark.sql.functions._

import graft.operators.LinearModel
import graft.sources.Tables

class LinearModelSpec extends SparkTestBase {

  test("engine-parity precondition: l_quantity is integral") {
    // the BIGINT cast of l_quantity must be lossless in BOTH engines
    // (Spark truncates, DuckDB rounds — identical only on integers)
    val frac = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") =!= floor(col("l_quantity")))
      .count()
    assert(frac == 0L)
  }

  test("least-squares normal equations hold: residuals orthogonal to design") {
    val fit = LinearModel.linearFit(spark, sf).collect().head
    val (b0, b1, b2) = (fit.getDouble(1), fit.getDouble(2), fit.getDouble(3))
    val feats = LinearModel.orderFeatures(spark, sf)
      .select("x1", "x2", "y").collect()
      .map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = feats.length.toDouble
    // defining property of the LS solution: Σr = Σr·x1 = Σr·x2 = 0
    val r = feats.map { case (x1, x2, y) => (y - (b0 + b1 * x1 + b2 * x2), x1, x2) }
    val scale = feats.map { case (_, _, y) => math.abs(y) }.sum
    assert(math.abs(r.map(_._1).sum) / scale < 1e-9)
    assert(math.abs(r.map(t => t._1 * t._2).sum) / (scale * n) < 1e-9)
    assert(math.abs(r.map(t => t._1 * t._3).sum) / (scale * n) < 1e-9)
    // and the fit is a real fit: quantity/line-count explain most of the
    // order's dollar total on TPC-H-shaped data
    val r2 = fit.getDouble(4)
    assert(r2 > 0.5 && r2 <= 1.0, s"r2=$r2")
  }

  test("grouped fit == global fit run on each group's slice") {
    val grouped = LinearModel.groupedFit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val feats = LinearModel.orderFeatures(spark, sf)
    for ((prio, expected) <- grouped) {
      val solo = LinearModel.solve(
        feats.filter(col("o_orderpriority") === prio)
          .agg(LinearModel.momentAggs.head, LinearModel.momentAggs.tail: _*))
        .collect().head
      // identical moments → identical shared-solve arithmetic → bit-equal
      assert((solo.getLong(0), solo.getDouble(1), solo.getDouble(2),
        solo.getDouble(3)) == expected, s"priority $prio")
    }
    assert(grouped.size == 5)
  }

  test("incremental retrain is bit-identical to the monolithic fit") {
    val full = LinearModel.linearFit(spark, sf).collect().toSeq
    val ivm = LinearModel.linearFitIncremental(spark, sf).collect().toSeq
    assert(ivm == full)
    // and the split actually splits: both sides non-empty
    val split = lit("1997-07-01").cast("timestamp")
    val orders = Tables.orders(spark, sf)
    assert(orders.filter(col("o_orderdate") < split).count() > 0)
    assert(orders.filter(col("o_orderdate") >= split).count() > 0)
  }

  test("streaming retrain: >=2 micro-batches, drained betas == batch fit") {
    val batch = LinearModel.linearFit(spark, sf).collect().toSeq
    val streamed = graft.streaming.StreamingLinear
      .linearFitAvailableNow(spark, sf).collect().toSeq
    assert(graft.streaming.StreamingLinear.lastNumBatches.get >= 2,
      "the drain must deliver one micro-batch per staged file")
    assert(streamed == batch)
    // two-incarnation checkpoint resume agrees with the declared drain
    val resumed = graft.streaming.StreamingLinear
      .linearFitAvailableNow(spark, sf, resumeProof = true).collect().toSeq
    assert(graft.streaming.StreamingLinear.lastNumBatches.get >= 2)
    assert(resumed == streamed)
  }

  test("outliers: scored by the fitted betas, ranked by |residual|") {
    val fit = LinearModel.linearFit(spark, sf).collect().head
    val (b0, b1, b2) = (fit.getDouble(1), fit.getDouble(2), fit.getDouble(3))
    val out = LinearModel.residualOutliers(spark, sf).collect()
    assert(out.length == 15)
    // each emitted residual recomputes from the row's own features
    out.foreach { r =>
      val expect = r.getLong(3).toDouble -
        (b0 + b1 * r.getLong(1).toDouble + b2 * r.getLong(2).toDouble)
      assert(r.getDouble(4) == expect, s"order ${r.getLong(0)}")
    }
    // ranking is by |resid| desc with orderkey tie-break
    val keys = out.map(r => (-math.abs(r.getDouble(4)), r.getLong(0)))
    assert(keys.sameElements(keys.sorted))
  }
}
