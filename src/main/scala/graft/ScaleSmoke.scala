package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE SMOKE — the missing evidence tier between the sf0.1 bench and
  * the 100 TB design claims: replicate the benchmark corpus N× (default
  * 10×, ~6M lineitem rows — "sf1") with per-replica key offsets, run the
  * heaviest relational + dedup queries at both scales, and report the
  * wall-time ratio per query. A query whose ratio blows past the data
  * ratio hides superlinear work (an accidental quadratic candidate set,
  * a broadcast flipped to a shuffle that thrashes) that sf0.1 alone
  * cannot expose.
  *
  * Replication preserves semantics, not statistics-identity:
  *  - every key column gets +replica·10^8, so FK joins stay within a
  *    replica and join/agg cardinalities scale linearly;
  *  - region/nation are genuine dimensions — copied, not replicated;
  *  - document text in replicas > 0 has every 4th word swapped for a
  *    replica token, so w-shingle sets are disjoint from the original
  *    (and from other replicas) and the near-dup workload scales ~N×
  *    instead of exploding quadratically on byte-identical copies.
  *
  * Output: ONE JSON line {"metric":"scale_smoke",...} with per-query
  * base/big seconds (min of 2 passes each), the ratio, and the physical
  * join mix at each scale (a broadcast→shuffle flip is visible even when
  * the ratio still passes). Exits nonzero if any query fails or any
  * ratio exceeds `maxRatio` (default 3× the data factor — generous slack
  * for fixed costs and AQE variance at this JVM-local size, tight enough
  * to catch quadratics, which land at ~N·factor×).
  */
object ScaleSmoke {

  private val Stride = 100000000L

  /** Build (memoized per base-corpus state) the N×-replicated corpus. */
  private[graft] def ensureReplica(spark: SparkSession, base: String,
                                   factor: Int): String =
    graft.util.Scratch.memoizedDir(spark,
      s"graft_scale_${factor}x_" + graft.util.Scratch.valueToken(base),
      graft.sources.Tables.listingSig(
        graft.sources.Tables.lineitem(spark, base))) { path =>
      def rep(name: String, keyCols: Seq[String])(
          extra: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
        val src = spark.read.parquet(s"$base/$name.parquet")
        (0 until factor).map { r =>
          keyCols.foldLeft(extra(src, r))((df, k) =>
            df.withColumn(k, col(k) + lit(r * Stride)))
        }.reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(s"$path/$name.parquet")
      }
      // dimensions: copied once — nations/regions are the same everywhere
      Seq("region", "nation").foreach { n =>
        spark.read.parquet(s"$base/$n.parquet")
          .write.mode("overwrite").parquet(s"$path/$n.parquet")
      }
      rep("customer", Seq("c_custkey"))()
      rep("supplier", Seq("s_suppkey"))()
      rep("part", Seq("p_partkey"))()
      rep("orders", Seq("o_orderkey", "o_custkey"))()
      rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))()
      rep("events", Seq("event_id", "user_id"))()
      rep("documents", Seq("doc_id")) { (df, r) =>
        if (r == 0) df
        else df.withColumn("text",
          array_join(transform(split(col("text"), " "),
            (w, i) => when(i % 4 === 3, lit(s"zz$r")).otherwise(w)), " "))
      }
    }

  private val SmokeQueries = Seq(
    "q1_pricing",            // the scan-agg baseline
    "q5_region_revenue",     // 6-table star join
    "q9_profit_nation",      // the widest relational join tree
    "q21_blame_supplier",    // heaviest shuffle in the suite
    "q_basket_rules",        // events self-join via baskets
    "q_copurchase_triangles",// triangle enumeration
    "q_minhash_lsh",         // banded near-dup candidates + verify
    "q_dup_clusters")        // LSH pairs + connected components

  private def joinMix(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    Seq("BroadcastHashJoin" -> "bhj", "SortMergeJoin" -> "smj",
      "ShuffledHashJoin" -> "shj", "BroadcastNestedLoopJoin" -> "bnlj")
      .map { case (op, tag) =>
        s"$tag:${op.r.findAllIn(plan).length}"
      }.mkString(",")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val maxRatio = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX_RATIO",
      (3 * factor).toString).toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val big = ensureReplica(spark, base, factor)
    val buildSecs = (System.nanoTime() - t0) / 1e9

    def time(name: String, dir: String): (Double, String) = {
      def once(): Double = {
        val t = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      val best = math.min(once(), once())
      val mix = joinMix(SparkEntry.queries(name)(spark, dir))
      (best, mix)
    }

    var failed = List.empty[String]
    val rows = SmokeQueries.map { q =>
      try {
        val (baseSec, baseMix) = time(q, base)
        val (bigSec, bigMix) = time(q, big)
        val ratio = bigSec / math.max(baseSec, 1e-9)
        if (ratio > maxRatio) failed ::= s"$q:ratio"
        f""""$q":{"base":$baseSec%.2f,"big":$bigSec%.2f,"ratio":$ratio%.2f,"base_mix":"$baseMix","big_mix":"$bigMix"}"""
      } catch { case e: Throwable =>
        System.err.println(s"[scale-smoke] $q failed: ${e.getMessage}")
        failed ::= q
        s""""$q":{"err":true}"""
      }
    }
    println(s"""{"metric":"scale_smoke","factor":$factor,"build_sec":${
      f"$buildSecs%.1f"},"max_ratio":$maxRatio,"queries":{${rows.mkString(",")}},"failed":[${
      failed.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
