package graft

import org.apache.spark.sql.SparkSession

/** Focused timing harness for iterating on single entries without an
  * 11-minute full bench: `runMain graft.Time <sfDir> <entry> [entry ...]`
  * where an entry is a query name (2 passes, min reported — the bench's
  * protocol) or `build:<name>` for a one-time materialization (1 pass;
  * run in a fresh JVM, builds memoize). Prints one `name=secs` line per
  * entry plus shuffle MB, in execution order.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-time")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
        }
      })
    def snap(): Long = {
      org.apache.spark.graftshim.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      shuffleBytes.get()
    }

    val builds: Map[String, () => Unit] = Map(
      "shingles" -> (() => { graft.operators.Dedup.ensureShingles(spark, sfDir); () }),
      "dup_clusters" -> (() => { graft.operators.Dedup.ensureClusters(spark, sfDir, 0.8); () }),
      "scrub_counts" -> (() => { graft.operators.TextAnalysis.ensureScrubCounts(spark, sfDir); () }),
      "pq_codes" -> (() => { graft.operators.Similarity.ensurePqCodes(spark, sfDir); () }),
      "token_grams" -> (() => { graft.operators.TextAnalysis.ensureTokenGrams(spark, sfDir); () }),
      // decomposition probes for the cluster build
      "pairs_noop" -> (() => {
        graft.operators.Dedup.ngramJaccardPairs(spark, sfDir, 0.8)
          .select("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save()
      }),
      "cc_from_pairs" -> (() => {
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_time_pairs"
        graft.operators.Dedup.ngramJaccardPairs(spark, sfDir, 0.8)
          .select("doc_a", "doc_b").write.mode("overwrite").parquet(p)
        val t = System.nanoTime()
        graft.operators.Dedup.dupClustersFromPairs(spark, spark.read.parquet(p))
          .write.format("noop").mode("overwrite").save()
        println(f"TIME cc_inner=${(System.nanoTime() - t) / 1e9}%.3f " +
          s"rounds=${graft.operators.Dedup.lastCcRounds.get}")
      }))

    // warmup
    try SparkEntry.queries("q_vocab_stats")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    names.foreach { n =>
      val t0 = System.nanoTime(); val s0 = snap()
      if (n.startsWith("build:")) {
        builds(n.stripPrefix("build:"))()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"TIME $n=$secs%.3f shuffle_mb=${(snap() - s0) / 1e6}%.1f")
      } else {
        def pass(): Double = {
          val p0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - p0) / 1e9
        }
        val a = pass(); val b = pass()
        println(f"TIME $n=${math.min(a, b)}%.3f cold=$a%.3f shuffle_mb=${(snap() - s0) / 1e6}%.1f")
      }
    }
    spark.stop()
  }
}
