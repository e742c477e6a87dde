package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LinearModel
import graft.sources.Tables

/** STREAMING MODEL RETRAIN — the closed-form regression of
  * [[graft.operators.LinearModel]] maintained as CDC-at-ingest state: each
  * micro-batch of newly-arrived orders contributes its ten exact integer
  * moments, the stored moment row absorbs them by componentwise sum (the
  * merge IS the aggregation — integer-exact, so the continuously-refreshed
  * betas equal a from-scratch retrain bit-for-bit), and state generations
  * are copy-on-write parquet, the [[StreamingScd2]] posture.
  *
  * The feed stages the orders table as two date-ordered batches through
  * two query incarnations over ONE checkpoint (resume proven), each batch
  * joining the static lineitem side inside `foreachBatch` — the
  * stream-static enrichment shape. Because the split is by order date and
  * an order's lines ride its single orders row, every feature row lands
  * wholly in one batch. The drained state answers the IDENTICAL monolithic
  * oracle as `q_linear_model`: at 100 TB this is "the quality model is
  * always current" for the price of aggregating each day's delta —
  * ten longs of state, never a re-scan.
  */
object StreamingLinear {

  private val scratch = new graft.util.ScratchSlot

  /** Spec observability: batches the last drain ran. */
  private[graft] val lastNumBatches =
    new java.util.concurrent.atomic.AtomicInteger(0)

  def linearFitAvailableNow(spark: SparkSession, sfDir: String,
                            splitAt: String = "1997-07-01"): DataFrame = {
    import java.nio.file.Files
    scratch.retire()
    val root = Files.createTempDirectory("graft_stream_linear_")
    val watch = root.resolve("watch")
    val cp = root.resolve("cp")
    val stateRoot = root.resolve("state")
    val split = lit(splitAt).cast("timestamp")
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"))
    orders.filter(col("o_orderdate") < split).coalesce(1)
      .write.parquet(watch.resolve("a").toString)

    val ss = StreamingIndexer.drainSession(spark)
    val schema = ss.read.parquet(watch.resolve("a").toString).schema
    val lineitem = Tables.lineitem(ss, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    lastNumBatches.set(0)
    @volatile var gen = 0
    val writeBatch: (Dataset[Row], Long) => Unit = { (batch, _) =>
      val delta = lineitem
        .join(batch.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("okey"))
        .agg(count(lit(1)).as("x1"),
          sum(col("l_quantity").cast("long")).as("x2"),
          sum(expr(LinearModel.centsExpr)).as("cents"))
        .selectExpr("okey", "x1", "x2", LinearModel.dollarsOfCents)
        .agg(LinearModel.momentAggs.head, LinearModel.momentAggs.tail: _*)
      val merged =
        if (gen == 0) delta
        else ss.read.parquet(stateRoot.resolve(s"v$gen").toString)
          .unionByName(delta)
          .agg(sum("n").as("n"),
            sum("s1").as("s1"), sum("s2").as("s2"), sum("sy").as("sy"),
            sum("s11").as("s11"), sum("s22").as("s22"), sum("s12").as("s12"),
            sum("s1y").as("s1y"), sum("s2y").as("s2y"), sum("syy").as("syy"))
      merged.coalesce(1).write.mode("overwrite")
        .parquet(stateRoot.resolve(s"v${gen + 1}").toString)
      gen += 1
      lastNumBatches.incrementAndGet()
      ()
    }
    def drain(): Unit =
      ss.readStream.schema(schema).parquet(watch.toString + "/*")
        .writeStream
        .foreachBatch(writeBatch)
        .option("checkpointLocation", cp.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()

    drain() // incarnation 1: the base history
    orders.filter(col("o_orderdate") >= split).coalesce(1)
      .write.parquet(watch.resolve("b").toString)
    drain() // incarnation 2 resumes the checkpoint: the delta only
    scratch.defer(() => graft.util.Scratch.deleteRecursively(root))
    LinearModel.solve(
      spark.read.parquet(stateRoot.resolve(s"v$gen").toString))
  }
}
