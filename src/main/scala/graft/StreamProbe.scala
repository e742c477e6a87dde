package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only harness (guide §1: measure first) for the streaming
  * family's per-query fixed cost: runs named streaming queries through the
  * bench's noop-sink protocol while capturing every micro-batch's
  * `StreamingQueryProgress.durationMs` breakdown (queryPlanning, walCommit,
  * addBatch, commitOffsets, state-store commit) from the shared listener
  * bus — the drains run on cloned sessions, so a per-session
  * StreamingQueryListener would miss them; the raw `onOtherEvent` hook on
  * the SparkContext bus sees them all. Not on any driver-timed path.
  *
  * `runMain graft.StreamProbe <sfDir> <query> [query ...]`
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // builder-level so CLONED sessions (the drains) inherit the A/B conf
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobCount = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.atomic.AtomicLong(0L)
    val durAgg = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) { taskTimeMs.addAndGet(m.executorRunTime); () }
        }
        override def onOtherEvent(
            e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
          case p: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent =>
            batches.incrementAndGet()
            p.progress.durationMs.forEach { (k, v) =>
              durAgg.computeIfAbsent(k,
                _ => new java.util.concurrent.atomic.AtomicLong(0L))
                .addAndGet(v)
              ()
            }
          case _: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent =>
            starts.incrementAndGet(); ()
          case _ => ()
        }
      })
    def snap(): Unit =
      org.apache.spark.graftshim.ListenerBridge.waitUntilEmpty(spark.sparkContext)

    // warmup
    try SparkEntry.queries("q_vocab_stats")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // phase decomposition of the canonical drainToTable shape (the
    // streaming_index query), replicated step by step with timestamps
    if (names.contains("phases")) {
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        def mark(label: String): Unit =
          println(f"PHASE pass=$pass $label t=${(System.nanoTime() - t0) / 1e9}%.3f")
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        mark("session")
        val watch = {
          // same staged copy the module uses (memoized after first call)
          val src = java.nio.file.Paths.get(sfDir, "documents.parquet")
          val sig = s"${java.nio.file.Files.size(src)}:${java.nio.file.Files.getLastModifiedTime(src).toMillis}"
          java.nio.file.Paths.get(graft.util.Scratch.memoizedDir(spark,
            "graft_feed_documents_" + graft.util.Scratch.valueToken(sfDir), sig) { d =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
            java.nio.file.Files.copy(src,
              java.nio.file.Paths.get(d).resolve("documents.parquet"))
            ()
          })
        }
        mark("staged")
        val table = s"graft_probe_idx_$pass"
        val q = graft.streaming.StreamingIndexer
          .postingsStream(ss, watch.toString).writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(table)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        mark("started")
        q.awaitTermination()
        mark("drained")
        if (sys.env.contains("GRAFT_PROBE_WIDE_SERVE"))
          ss.conf.set("spark.sql.shuffle.partitions", cpus)
        import org.apache.spark.sql.functions._
        val serveDf = ss.table(table)
          .select(substring(col("term"), 1, 1).as("first_letter"),
            col("term"), col("doc_id"), col("tf"))
          .orderBy("term", "doc_id")
        serveDf.write.format("noop").mode("overwrite").save()
        mark("served")
        serveDf.write.format("noop").mode("overwrite").save()
        mark("served_again")
        println(s"PHASE rows=${ss.table(table).count()}")
        ss.catalog.dropTempView(table)
        ()
      }
    }

    names.foreach { n =>
      (1 to 2).foreach { pass =>
        snap()
        jobCount.set(0); taskTimeMs.set(0); batches.set(0); starts.set(0)
        durAgg.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        snap()
        val durs = {
          import scala.jdk.CollectionConverters._
          durAgg.asScala.toSeq.sortBy(-_._2.get())
            .map { case (k, v) => f"$k=${v.get() / 1e3}%.2f" }.mkString(" ")
        }
        println(f"PROBE $n pass=$pass wall=$secs%.3f starts=${starts.get()} " +
          f"batches=${batches.get()} jobs=${jobCount.get()} " +
          f"task_s=${taskTimeMs.get() / 1e3}%.2f | $durs")
      }
    }
    spark.stop()
  }
}
