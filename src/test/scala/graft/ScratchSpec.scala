package graft

import graft.operators.{Compaction, Indexer}
import graft.streaming.StreamingIndexer

/** The round-trip queries stage scratch artifacts (corpus copies, scratch
  * indexes, memory-sink tables) per execution; ScratchSlot keeps exactly
  * one generation per call site alive — the previous run's artifacts are
  * disposed when the next run starts. Without this, the bench alone
  * (2 executions per query) grows /tmp and driver memory monotonically.
  */
class ScratchSpec extends SparkTestBase {

  private def tmpDirCount(prefix: String): Int = {
    val root = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(root.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith(prefix))
  }

  test("compaction round-trip keeps at most one scratch generation") {
    val before = tmpDirCount("graft_compact_docs_")
    Compaction.compactedRoundTrip(spark, sf).collect()
    Compaction.compactedRoundTrip(spark, sf).collect()
    assert(tmpDirCount("graft_compact_docs_") <= math.max(before, 1))
  }

  test("upsert round-trip keeps at most one scratch index") {
    val before = tmpDirCount("graft_upsert_ix_")
    Indexer.upsertRoundTrip(spark, sf).collect()
    Indexer.upsertRoundTrip(spark, sf).collect()
    assert(tmpDirCount("graft_upsert_ix_") <= math.max(before, 1))
  }

  test("streaming drain drops the previous staging dir and memory table") {
    val before = tmpDirCount("graft_stream_index_")
    StreamingIndexer.indexAvailableNow(spark, sf).collect()
    StreamingIndexer.indexAvailableNow(spark, sf).collect()
    assert(tmpDirCount("graft_stream_index_") <= math.max(before, 1))
    val views = spark.catalog.listTables().collect()
      .map(_.name).count(_.startsWith("graft_stream_index_"))
    assert(views <= 1, s"expected at most one live memory table, got $views")
  }
}
