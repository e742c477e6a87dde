package graft

import org.apache.spark.sql.functions._

import graft.sources.v2.{RefIndexInterop, RefIndexSource}

/** The DataSource V2 reader of the reference's native index format:
  * round-trip fidelity, planning-time letter pruning, and column
  * pruning.
  */
class RefIndexSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def load() = spark.read
    .format(classOf[RefIndexSource].getName)
    .option("path", RefIndexInterop.ensureRefIndex(spark, sf))
    .load()

  test("round-trip: ref-format files read back equal batch postings") {
    val got = load().select("term", "doc_id", "tf")
      .as[(String, Long, Long)].collect().toSet
    val expected = graft.operators.Indexer.postings(spark, sf)
      .select("term", "doc_id", "tf")
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("term filter prunes to ONE letter file at planning time") {
    val lookup = load().filter(col("term") === "the")
    // partitions == surviving letter files; 'the' lives in exactly 't'
    assert(lookup.rdd.getNumPartitions === 1,
      "pushed term-equality did not prune the scan to one letter file")
    val nFiles = Option(new java.io.File(
        RefIndexInterop.ensureRefIndex(spark, sf)).listFiles())
      .getOrElse(Array.empty).count(f => f.isFile && f.getName.length == 1)
    val all = load()
    assert(all.rdd.getNumPartitions === nFiles,
      s"unfiltered scan should read every letter file ($nFiles)")
    assert(nFiles > 10, "fixture degenerate: almost no letter files")
    // prefix and IN pushdown
    assert(load().filter(col("term").startsWith("qu")).rdd.getNumPartitions === 1)
    assert(load().filter(col("term").isin("the", "and", "table"))
      .rdd.getNumPartitions === 2) // letters t and a
  }

  test("filters remain residuals: pruning is a superset, rows still exact") {
    val got = load().filter(col("term") === "the")
      .select("doc_id", "tf").as[(Long, Long)].collect().toSet
    val expected = graft.operators.Indexer.postings(spark, sf)
      .filter(col("term") === "the")
      .select("doc_id", "tf").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("column pruning: projected read materializes only requested fields") {
    val df = load().select("tf")
    assert(df.schema.fieldNames.toSeq === Seq("tf"))
    assert(df.agg(sum(col("tf"))).head().getLong(0) > 0)
  }
}
