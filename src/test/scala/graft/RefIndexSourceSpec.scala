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

  test("V2 write: letter-clustered, term-sorted, deterministic, no temp litter") {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_refindex_wtest")
    graft.util.Scratch.deleteRecursively(dir)
    def writeOnce(): Map[String, String] = {
      graft.operators.Indexer.postings(spark, sf)
        .select(org.apache.spark.sql.functions.substring(col("term"), 1, 1)
          .as("first_letter"), col("term"), col("doc_id"), col("tf"))
        .write.format(classOf[RefIndexSource].getName)
        .option("path", dir.toString).mode("overwrite").save()
      Option(dir.toFile.listFiles()).getOrElse(Array.empty)
        .map(f => f.getName ->
          new String(Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)).toMap
    }
    val first = writeOnce()
    assert(first.keySet.forall(_.length == 1),
      s"temp/extra files left behind: ${first.keySet.filter(_.length != 1)}")
    assert(first.nonEmpty)
    // required ordering → every file sorted by (term, doc_id)
    first.foreach { case (letter, body) =>
      val keys = body.split("\n").filter(_.nonEmpty).map { l =>
        val p = l.split(" "); (p(0), p(1).toLong)
      }
      assert(keys.sameElements(keys.sortBy(identity)),
        s"letter file $letter is not (term, doc_id)-sorted")
      assert(keys.forall(_._1.startsWith(letter)),
        s"letter file $letter contains foreign terms")
    }
    val second = writeOnce()
    assert(first === second, "two V2 writes are not byte-identical")
    graft.util.Scratch.deleteRecursively(dir)
  }

  test("byte-range splits: a letter file fans out into >1 partition, rows exact") {
    val path = RefIndexInterop.ensureRefIndex(spark, sf)
    val nFiles = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty).count(f => f.isFile && f.getName.length == 1)
    val split = spark.read.format(classOf[RefIndexSource].getName)
      .option("path", path).option("splitBytes", 512).load()
    assert(split.rdd.getNumPartitions > nFiles,
      s"512-byte splits yielded ${split.rdd.getNumPartitions} partitions " +
        s"for $nFiles files — within-file splitting is not happening")
    val got = split.select("term", "doc_id", "tf")
      .as[(String, Long, Long)].collect().sorted.toSeq
    val whole = load().select("term", "doc_id", "tf")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(got === whole,
      "byte-range scan lost or duplicated rows at split boundaries")
    // pruning still composes with splitting
    val lk = spark.read.format(classOf[RefIndexSource].getName)
      .option("path", path).option("splitBytes", 512).load()
      .filter(col("term") === "the")
      .select("doc_id", "tf").as[(Long, Long)].collect().toSet
    val lkWhole = load().filter(col("term") === "the")
      .select("doc_id", "tf").as[(Long, Long)].collect().toSet
    assert(lk === lkWhole && lk.nonEmpty)
  }

  test("byte-range splits: every boundary placement reads each line exactly once") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_refindex_split_")
    try {
      val body = "aa 1 2\nab 10 3\nabc 100 42\nazz 7 1\n"
      Files.write(Paths.get(dir.toString, "a"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val expected = body.split("\n").map { l =>
        val p = l.split(" "); (p(0), p(1).toLong, p(2).toLong)
      }.sorted.toSeq
      // sweep split sizes 1..body.length: every possible boundary position
      // lands mid-line, at a line start, and at the newline itself
      for (sb <- 1 to body.length) {
        val got = spark.read.format(classOf[RefIndexSource].getName)
          .option("path", dir.toString).option("splitBytes", sb).load()
          .select("term", "doc_id", "tf")
          .as[(String, Long, Long)].collect().sorted.toSeq
        assert(got === expected, s"splitBytes=$sb broke exactly-once reads")
      }
    } finally graft.util.Scratch.deleteRecursively(dir)
  }

  test("runtime filtering: data-derived letters prune the scan at execution") {
    graft.sources.v2.RefIndexScan.lastRuntimeLetters = None
    val df = RefIndexInterop.refIndexRuntimePruned(spark, sf, 10L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no runtime pruning subquery on the V2 scan:\n${plan.take(2000)}")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // the runtime filter delivered a PROPER subset of letters to the scan
    val delivered = graft.sources.v2.RefIndexScan.lastRuntimeLetters
    assert(delivered.isDefined, "scan never received a runtime filter")
    val allLetters = graft.operators.Indexer.postings(spark, sf)
      .select(substring(col("term"), 1, 1)).distinct().count()
    assert(delivered.get.nonEmpty && delivered.get.size < allLetters,
      s"no pruning: ${delivered.get.size} of $allLetters letters")
    // values equal the unpruned recompute
    val postings = graft.operators.Indexer.postings(spark, sf)
      .select(substring(col("term"), 1, 1).as("first_letter"), col("tf"))
    val hot = postings.filter(col("tf") >= 10)
      .select("first_letter").distinct()
      .as[String].collect().toSet
    val expected = postings
      .filter(col("first_letter").isin(hot.toSeq: _*))
      .groupBy("first_letter")
      .agg(count(lit(1)).as("n"), sum("tf").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected && got.nonEmpty)
    assert(delivered.get === hot, "runtime letters != the hot-letter dim")
  }

  test("limit pushdown: readers stop early, rows stay valid") {
    val df = load().limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=5"), s"limit not pushed to the scan:\n$plan")
    val rows = df.collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[String]("term").nonEmpty && r.getAs[Long]("tf") >= 1)
    }
  }

  test("statistics: size reported from the pruned file list, not the default") {
    val full = load().queryExecution.optimizedPlan.stats.sizeInBytes
    val dir = new java.io.File(RefIndexInterop.ensureRefIndex(spark, sf))
    val bytes = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.length == 1).map(_.length()).sum
    assert(full === BigInt(bytes * 3),
      s"stats $full != 3x file bytes ${bytes * 3}")
    // planning-time pruning shrinks the estimate with it
    val pruned = load().filter(col("term") === "the")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(pruned < full, s"pruned $pruned !< full $full")
  }

  test("key-grouped partitioning: letter rollup runs exchange-free") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = load().groupBy("first_letter")
        .agg(count(lit(1)).as("n"), sum("tf").as("s"))
      val shuffles = df.queryExecution.executedPlan.collect {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      }.sum
      assert(shuffles === 0,
        s"letter rollup shuffled:\n${df.queryExecution.executedPlan}")
      val got = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val expected = graft.operators.Indexer.postings(spark, sf)
        .groupBy(substring(col("term"), 1, 1).as("l"))
        .agg(count(lit(1)).as("n"), sum("tf").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected && got.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("column pruning: projected read materializes only requested fields") {
    val df = load().select("tf")
    assert(df.schema.fieldNames.toSeq === Seq("tf"))
    assert(df.agg(sum(col("tf"))).head().getLong(0) > 0)
  }
}
