package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers most cases
  * at runtime; explicit salting remains the tool for pathological
  * heavy-hitter keys (one key ≫ a partition) or for engines/stages where
  * AQE cannot split (e.g. aggregations feeding a join).
  */
object Skew {

  /** Salted equi-join: spread each probe-side key over `salt` sub-keys and
    * replicate the build side once per sub-key, so a heavy-hitter key
    * lands on `salt` partitions instead of one. Output is identical to
    * `probe.join(build, key)` — only the shuffle routing changes. The
    * salt assignment hashes the whole probe row (deterministic, no rand).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val probeCols = probe.columns
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probeCols.map(col): _*), lit(salt)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
