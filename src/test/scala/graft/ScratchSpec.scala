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

  test("defer accumulates within a generation; retire runs every batch") {
    val slot = new graft.util.ScratchSlot
    var ran = Set.empty[Int]
    slot.defer(() => ran += 1)
    slot.defer(() => ran += 2) // second defer in the same generation
    slot.retire()
    assert(ran === Set(1, 2), "a second defer must not drop the first batch")
    slot.retire() // generation already disposed: nothing runs twice
    assert(ran === Set(1, 2))
  }

  /** The one-generation invariant, stated so it holds regardless of what
    * OTHER processes left in java.io.tmpdir: the first run may stage one
    * new dir; every subsequent run must retire its predecessor before
    * staging (no net growth between consecutive runs).
    */
  private def assertOneGeneration(prefix: String)(run: => Unit): Unit = {
    val before = tmpDirCount(prefix)
    run
    val afterOne = tmpDirCount(prefix)
    run
    val afterTwo = tmpDirCount(prefix)
    assert(afterOne <= before + 1,
      s"first run staged ${afterOne - before} $prefix dirs, expected <= 1")
    assert(afterTwo <= afterOne,
      s"second run grew $prefix dirs $afterOne -> $afterTwo: " +
        "previous generation was not retired")
  }

  test("materialized scratch dirs are per-process") {
    // two drivers sharing one scratch root must not clobber each other's
    // materializations: the path embeds this process's pid
    val p = graft.util.Scratch.dir(spark, "graft_scratch_spec")
    assert(p.endsWith("_p" + java.lang.ProcessHandle.current().pid()),
      s"scratch dir not process-scoped: $p")
  }

  test("compaction round-trip keeps at most one scratch generation") {
    assertOneGeneration("graft_compact_docs_") {
      Compaction.compactedRoundTrip(spark, sf).collect()
    }
  }

  test("ORC round-trip keeps at most one scratch generation") {
    assertOneGeneration("graft_orc_docs_") {
      graft.operators.Formats.orcRoundTrip(spark, sf).collect()
    }
  }

  test("CSV round-trip keeps at most one scratch generation") {
    assertOneGeneration("graft_csv_docs_") {
      graft.operators.Formats.csvRoundTrip(spark, sf).collect()
    }
  }

  test("upsert round-trip keeps at most one scratch index") {
    assertOneGeneration("graft_upsert_ix_") {
      Indexer.upsertRoundTrip(spark, sf).collect()
    }
  }

  /** Cluster-safety: a multi-node deployment points spark.graft.scratchDir
    * at shared storage; every materialized scratch relation must honor it
    * (a bare local tmpdir is per-node there — executors would write
    * private copies the readers never see).
    */
  test("spark.graft.scratchDir reroutes materialized scratch relations") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_scratch_root_").toString
    spark.conf.set("spark.graft.scratchDir", root)
    try {
      val sh = graft.operators.Dedup.ensureShingles(spark, sf)
      val ix = graft.operators.MaterializedIndex.ensure(spark, sf)
      val cl = graft.operators.Dedup.ensureClusters(spark, sf, 0.5)
      for (p <- Seq(sh, ix, cl)) {
        assert(p.startsWith(root), s"scratch path $p escaped root $root")
        assert(spark.read.parquet(p).count() > 0, s"empty scratch relation $p")
      }
    } finally {
      spark.conf.unset("spark.graft.scratchDir")
      graft.util.Scratch.deleteRecursively(root)
    }
  }

  test("streaming drain drops the previous staging dir and memory table") {
    assertOneGeneration("graft_stream_index_") {
      StreamingIndexer.indexAvailableNow(spark, sf).collect()
    }
    val views = spark.catalog.listTables().collect()
      .map(_.name).count(_.startsWith("graft_stream_index_"))
    assert(views <= 1, s"expected at most one live memory table, got $views")
  }
}
