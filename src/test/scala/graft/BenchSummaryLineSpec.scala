package graft

/** The bench's FINAL stdout line is the round's machine-readable record
  * and the driver keeps only a ~2000-char stdout tail (the r17 record was
  * lost to a tail-truncated line): the line builder must stay under
  * [[Bench.MaxFinalLineChars]] for ANY suite size, degrading by dropping
  * the fastest queries behind an explicit "omitted" count — never by
  * emitting an unparseable prefix.
  */
class BenchSummaryLineSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def entries(n: Int): Seq[(String, Either[String, Double])] =
    (1 to n).map(i => s"q_synthetic_query_name_$i" ->
      (Right(i * 0.137): Either[String, Double]))

  private def line(nQueries: Int, nFailed: Int = 0, shed: Int = 0): String = {
    val failed = (1 to nFailed).map(i => s"q_failed_query_$i")
    Bench.finalSummaryLine(
      best = entries(nQueries) ++ failed.map(f => f -> (Left(f): Either[String, Double])),
      buildSecs = Bench.shortKey.keys.toSeq.sorted.map(_ -> 1.234) ++
        Seq("jaccard_pairs_materialize" -> 6.5, "graph_edges_materialize" -> 4.2),
      total = 271.93, coldTotal = 307.98,
      cacheHitsJson = """{"clustered_layout":0,"bpe_merges":0,"bloom_manifest":0}""",
      canaryCompact = """{"n":23,"min":0.08,"max":1.74}""",
      shedJson = s"""{"warm":$shed,"third":0}""",
      warmShedCount = shed, thirdShed = 0,
      failed = failed, sfDir = "/root/testdata/sf0.1")
  }

  test("final line fits the tail window at every suite size") {
    // today's suite (~260 queries), a doubled suite, and a far-future one
    Seq(50, 260, 520, 2000).foreach { n =>
      val l = line(n)
      assert(l.length <= Bench.MaxFinalLineChars, s"n=$n -> ${l.length} chars")
      assert(l.startsWith("""{"metric":"total","value":"""))
      assert(l.endsWith(""""sf":"/root/testdata/sf0.1"}"""))
    }
  }

  test("failures and shed disclosure survive the degraded form") {
    val l = line(2000, nFailed = 3, shed = 40)
    assert(l.length <= Bench.MaxFinalLineChars)
    assert(l.contains(""""failed":["q_failed_query_1""""))
    assert(l.contains(""""shed":{"warm":40"""))
    // degraded form says how many entries were cut
    assert(l.contains(""","omitted":"""))
    // failures sort first (Double.MaxValue), so they keep their entries
    assert(l.contains(""""failed_query_1":-1"""))
  }

  test("small suites keep every query at 2dp") {
    val l = line(40)
    assert(!l.contains("omitted"))
    assert(l.contains(""""synthetic_query_name_40":5.48"""))
  }
}
