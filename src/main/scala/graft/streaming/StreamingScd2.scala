package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Events, Incremental}
import graft.sources.Tables

/** STREAMING SCD2 — CDC at ingest: the slowly-changing-dimension table
  * maintained micro-batch by micro-batch with the SAME state merge the
  * batch IVM path uses ([[graft.operators.Incremental.scd2Merge]]).
  * Each batch's events become delta runs ([[Events.scd2Of]] — a batch
  * plan inside `foreachBatch`, where arbitrary stateful merges are
  * legal), and the stored dimension absorbs them: open versions extend
  * or close, new versions append, untouched users carry verbatim. State
  * generations are copy-on-write parquet (write v(n+1), then read it
  * next batch) so a failed batch never corrupts the current state.
  *
  * The feed is staged as two time-ordered batches through two query
  * incarnations sharing one checkpoint (the [[StreamingIndexer]] resume
  * pattern) — the arrival-order guarantee scd2Merge needs (every delta
  * event follows every stored event per user), which is the same
  * guarantee a production CDC feed provides per key. The drained final
  * state answers to the IDENTICAL monolithic oracle as the batch build:
  * stream-merged ≡ rebuilt, versions, flags, intervals and all.
  */
object StreamingScd2 {

  private val scratch = new graft.util.ScratchSlot

  /** Spec observability: batches the last drain ran. */
  private[graft] val lastNumBatches =
    new java.util.concurrent.atomic.AtomicInteger(0)

  def scd2AvailableNow(spark: SparkSession, sfDir: String,
                       splitAt: String = "2024-01-24 00:00:00"): DataFrame = {
    import java.nio.file.Files
    scratch.retire()
    val root = Files.createTempDirectory("graft_stream_scd2_")
    val watch = root.resolve("watch")
    val cp = root.resolve("cp")
    val stateRoot = root.resolve("state")
    // the two time-split batch FILES are a pure function of the corpus —
    // memoized once per corpus state (stage through Tables.events so
    // staged ts is plain µs TimestampType); each execution assembles its
    // own watch dir by HARDLINK, batch by batch, so the two-incarnation
    // resume proof is untouched while the corpus writes happen once
    val staged = StreamingIndexer.ensureSplitFeed(spark,
      // the split VALUE keys the name via the collision-free token (bare
      // sanitization would collapse '2024-01-01 00:00' variants differing
      // only in non-word chars onto one memo dir; a hashCode would
      // silently collide across distinct parameterizations)
      s"graft_scd2_feed_${graft.util.Scratch.valueToken(splitAt)}_" +
        graft.util.Scratch.valueToken(sfDir),
      graft.sources.Tables.listingSig(Tables.events(spark, sfDir)))(
      a => {
        val split = lit(splitAt).cast("timestamp")
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .filter(col("ts") < split).coalesce(1).write.parquet(a)
      },
      b => {
        val split = lit(splitAt).cast("timestamp")
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .filter(col("ts") >= split).coalesce(1).write.parquet(b)
      })
    graft.util.Scratch.hardlinkTree(s"$staged/a", watch.resolve("a").toString)

    val ss = StreamingIndexer.drainSession(spark)
    val schema = ss.read.parquet(watch.resolve("a").toString).schema
    lastNumBatches.set(0)
    @volatile var gen = 0
    val writeBatch: (Dataset[Row], Long) => Unit = { (batch, _) =>
      val runs = Events.scd2Of(batch.select(col("user_id"), col("event_id"),
        expr("unix_millis(ts)").as("ms"), col("event_type")))
      val merged =
        if (gen == 0) runs
        else Incremental.scd2Merge(
          ss.read.parquet(stateRoot.resolve(s"v$gen").toString), runs)
      merged.write.mode("overwrite")
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
    graft.util.Scratch.hardlinkTree(s"$staged/b", watch.resolve("b").toString)
    drain() // incarnation 2 resumes the checkpoint: the delta only
    scratch.defer(() => graft.util.Scratch.deleteRecursively(root))
    spark.read.parquet(stateRoot.resolve(s"v$gen").toString)
      .orderBy("user_id", "version")
  }
}
