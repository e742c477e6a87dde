package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Protocol (reproducibility over luck):
  *  - Each query is fully executed through the `noop` sink (count() would
  *    let Catalyst prune projections; noop materializes every column).
  *  - A warmup query runs first so JVM/codegen startup cost isn't charged
  *    to the first benchmark entry.
  *  - TWO passes per query; the reported per-query number and the total
  *    are the per-query MIN (steady-state plan cost, robust to one-off
  *    JIT/GC/machine-contention spikes). The cold first-pass numbers are
  *    reported separately under "cold".
  *  - Failures are LOUD: a throwing query is retried once (pass 2), its
  *    name lands in "failed", its cost is excluded from the total, and the
  *    process exits nonzero — a broken query can never make the bench look
  *    faster.
  *  - EVERY one-time materialization (serving index, positional index,
  *    shingle relation, dup-cluster labels, bucketed tables) runs ONCE
  *    before the passes, timed individually and reported as its own
  *    "*_materialize" entry. The query passes therefore measure pure
  *    serve cost, and the builds' TCO is visible in the total instead of
  *    being charged to the cold pass of whichever query first triggers a
  *    build and then vanishing from the min-of-2.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS) — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Left(name)
      }
    }

    // warmup: smallest end-to-end plan, absorbs session/codegen startup
    exec("q_vocab_stats")
    // every build-once materialization, timed on its own BEFORE the query
    // passes; ordered so shared prerequisites (the shingle relation feeds
    // the cluster labeling) are charged to their own entry
    val builds: Seq[(String, () => Unit)] = Seq(
      "index_materialize" ->
        (() => { graft.operators.MaterializedIndex.ensure(spark, sfDir); () }),
      "positional_materialize" ->
        (() => { graft.operators.MaterializedIndex.ensurePositional(spark, sfDir); () }),
      "shingles_materialize" ->
        (() => { graft.operators.Dedup.ensureShingles(spark, sfDir); () }),
      "dup_clusters_materialize" ->
        (() => { graft.operators.Dedup.ensureClusters(spark, sfDir, 0.8); () }),
      "bucketed_tables_materialize" ->
        (() => { graft.operators.Bucketing.ensureBucketed(spark, sfDir); () }))
    val buildSecs: Seq[(String, Double)] = builds.map { case (name, run) =>
      val t0 = System.nanoTime()
      run()
      name -> (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = names.map(n => n -> exec(n)).toMap
    val warm = names.map(n => n -> exec(n)).toMap
    val best = names.map { n =>
      n -> ((cold(n), warm(n)) match {
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (_, Right(b))        => Right(b)
        case (Right(a), _)        => Right(a)
        case (Left(_), l)         => l
      })
    }
    val failed = best.collect { case (n, Left(_)) => n }
    def fmt(xs: Seq[(String, Either[String, Double])]): String =
      xs.map { case (k, v) =>
        "\"" + k + "\":" + v.fold(_ => "-1", d => f"$d%.3f")
      }.mkString("{", ",", "}")
    // total = every one-time build + min-of-2 of every query: the full
    // build-plus-serve TCO of one pass over the suite
    val total = best.collect { case (_, Right(d)) => d }.sum +
      buildSecs.map(_._2).sum
    val qs = fmt(best ++ buildSecs.map { case (n, s) => n -> Right(s) })
    val coldJson = fmt(cold.toSeq.sortBy(_._1))
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$coldJson,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
