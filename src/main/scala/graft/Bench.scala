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
  *  - The materialized-index build runs ONCE before the passes and is
  *    reported as "index_materialize": the serve queries
  *    (q_index_serve_*) therefore measure pure query-time against the
  *    prebuilt index, separating build cost from serve cost.
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
    // build the serving index once, outside the query passes
    val tIdx0 = System.nanoTime()
    graft.operators.MaterializedIndex.ensure(spark, sfDir)
    val idxBuildSec = (System.nanoTime() - tIdx0) / 1e9

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
    val total = best.collect { case (_, Right(d)) => d }.sum +
      (if (names.contains("q_index_serve_lookup")) idxBuildSec else 0.0)
    val qs = fmt(best :+ ("index_materialize" -> Right(idxBuildSec)))
    val coldJson = fmt(cold.toSeq.sortBy(_._1))
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$coldJson,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
