package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-ADAPTIVE scan spreading (guide §2.5 "input skew" / §2.6 idle
  * capacity): round-robin-repartition a relation ahead of EXPENSIVE
  * per-row work (tokenize + explode, codec decode, heavy hashing) — but
  * only when the scan cannot feed the available task slots by itself.
  *
  * Why it exists: a single-row-group parquet file is a ONE-TASK scan no
  * matter how many cores the cluster has (parquet assigns a row group to
  * the split holding its midpoint — `maxPartitionBytes` cannot cut finer
  * than row groups), so every pipeline that fuses expensive work into
  * such a scan runs serially while the rest of the machine idles. The
  * bench corpus is exactly that shape: one file, one row group per table.
  *
  * Why it is scale-safe: the guard derives from the ACTUAL scan split
  * count vs the ACTUAL slot count — at production scale the source has
  * many splits, the guard is a no-op and no exchange is added. When it
  * does fire, the exchange moves the pre-explosion rows (documents, ids)
  * — the cheapest point of the pipeline to rebalance (§8: move decisions
  * on light rows, not heavy derived rows).
  */
object Spread {
  // split-count probe results per cache key: the probe costs a plan
  // conversion (~tens of ms), and the decision is PERFORMANCE-ONLY —
  // results never depend on partitioning — so serving a stale count after
  // an in-place corpus mutation costs at most a suboptimal plan, never a
  // wrong answer.
  private val probed = scala.collection.concurrent.TrieMap[String, Int]()

  def scan(spark: SparkSession, df: DataFrame,
           cacheKey: String = ""): DataFrame = {
    val slots = spark.sparkContext.defaultParallelism
    // physical partition count of df as planned (file splits for a scan):
    // planning-only, no job. Spread only when the scan is under half the
    // slots — a wider scan gains less from rebalancing than one exchange
    // costs.
    // Target width: slots/4 by default, overridable via
    // spark.graft.scanSpreadDivisor (0 disables the spread entirely).
    // The divisor exists because per-task fixed cost is real: splitting
    // sub-second work 32 ways loses more to per-task codegen/JIT warmup
    // than it gains in parallelism (measured: 32-way tokenize stages cost
    // 15× the serial CPU at bench scale); /4 keeps per-task work above
    // that floor while still engaging multiple cores.
    // parse defensively: a malformed divisor must degrade to the default,
    // not throw inside a micro-batch function
    val divisor = scala.util.Try(
      spark.conf.get("spark.graft.scanSpreadDivisor", "4").trim.toInt)
      .getOrElse(4)
    if (divisor <= 0) return df
    val target = math.max(2, slots / divisor)
    val parts =
      if (cacheKey.isEmpty) df.rdd.getNumPartitions
      else probed.getOrElseUpdate(cacheKey, df.rdd.getNumPartitions)
    if (parts * 2 < target) df.repartition(target) else df
  }
}
