package graft

/** State-backend portability: the streaming drains must produce
  * bit-identical results under the RocksDB state store provider — the
  * off-heap backend a production cluster runs for unbounded state
  * (HDFS-backed heap state caps at executor memory; RocksDB spills to
  * local disk with incremental checkpointing). Exercises BOTH session
  * mechanisms — the native `session_window` merging aggregation and the
  * `flatMapGroupsWithState` state function — plus the state-store dedup,
  * against their default-backend outputs.
  */
class StateStoreBackendSpec extends SparkTestBase {

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def withRocksDB[A](body: => A): A = {
    spark.conf.set("spark.graft.stateStoreProvider", RocksDB)
    try body finally spark.conf.unset("spark.graft.stateStoreProvider")
  }

  test("session_window drain is identical under RocksDB state") {
    val default = collectSorted(
      graft.streaming.StreamingSessionWindow.sessionsAvailableNow(spark, sf))
    val rocks = withRocksDB(collectSorted(
      graft.streaming.StreamingSessionWindow.sessionsAvailableNow(spark, sf)))
    assert(rocks === default)
    assert(rocks.nonEmpty)
  }

  test("flatMapGroupsWithState sessionizer is identical under RocksDB state") {
    val default = collectSorted(
      graft.streaming.StreamingSessionize.sessionsAvailableNow(spark, sf))
    val rocks = withRocksDB(collectSorted(
      graft.streaming.StreamingSessionize.sessionsAvailableNow(spark, sf)))
    assert(rocks === default)
    assert(rocks.nonEmpty)
  }

  test("the provider conf is honored, not silently ignored") {
    // a bogus provider class must make the drain fail — proving the
    // RocksDB runs above actually ran on the configured backend
    spark.conf.set("spark.graft.stateStoreProvider", "graft.NoSuchProvider")
    try {
      val e = intercept[Exception] {
        graft.streaming.StreamingSessionWindow.sessionsAvailableNow(spark, sf)
          .collect()
      }
      def chainHas(t: Throwable, s: String): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains(s)) ||
          chainHas(t.getCause, s))
      assert(chainHas(e, "NoSuchProvider"))
    } finally spark.conf.unset("spark.graft.stateStoreProvider")
  }

  test("state-store dedup is identical under RocksDB state") {
    val default = collectSorted(
      graft.streaming.StreamingDedup.dedupAvailableNow(spark, sf))
    val rocks = withRocksDB(collectSorted(
      graft.streaming.StreamingDedup.dedupAvailableNow(spark, sf)))
    assert(rocks === default)
    assert(rocks.nonEmpty)
  }
}
