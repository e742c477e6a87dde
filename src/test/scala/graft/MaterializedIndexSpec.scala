package graft

import graft.operators.{Indexer, MaterializedIndex}

class MaterializedIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("served term lookup == corpus-scan term lookup") {
    val served = MaterializedIndex.termLookup(spark, sf, "window")
      .as[(String, Long, Long)].collect().toSeq
    val scanned = Indexer.termLookup(spark, sf, "window")
      .as[(String, Long, Long)].collect().toSeq
    assert(served.nonEmpty)
    assert(served === scanned)
  }

  test("served multi-term AND == corpus-scan multi-term AND") {
    val terms = Seq("scan", "join", "filter")
    val served = MaterializedIndex.multiTermAnd(spark, sf, terms)
      .as[(Long, Long)].collect().toSeq
    val scanned = Indexer.multiTermAnd(spark, sf, terms)
      .as[(Long, Long)].collect().toSeq
    assert(served === scanned)
  }

  test("ensure builds once per JVM (second call returns the same path, no rebuild)") {
    val p1 = MaterializedIndex.ensure(spark, sf)
    val mtimes1 = new java.io.File(p1).listFiles().map(_.lastModified()).toSeq
    val p2 = MaterializedIndex.ensure(spark, sf)
    val mtimes2 = new java.io.File(p2).listFiles().map(_.lastModified()).toSeq
    assert(p1 === p2)
    assert(mtimes1 === mtimes2)
  }
}
