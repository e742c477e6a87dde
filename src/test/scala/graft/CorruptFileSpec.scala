package graft

/** Corrupt-blob resilience at the SCAN layer — the parquet twin of the
  * JsonCorpus corrupt-record quarantine and the multimodal codec
  * quarantine: at 100 TB a handful of truncated/garbage files per
  * billion is the norm (failed writers, partial uploads), and the
  * operational posture must be explicit — fail loudly by default,
  * degrade to the readable subset when the pipeline opts in via
  * `spark.sql.files.ignoreCorruptFiles`.
  */
class CorruptFileSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    spark.read.parquet(s"$sf/documents.parquet").coalesce(2)
      .write.mode("overwrite").parquet(d)
    // a garbage file that sniffs as parquet by suffix but is not
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "part-junk.parquet"),
      "this is not parquet".getBytes("UTF-8"))
    d
  }

  test("default posture: a corrupt file fails the scan loudly") {
    val e = intercept[Exception] {
      spark.read.parquet(dir).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
        m.toLowerCase.contains("parquet") || m.toLowerCase.contains("footer")),
      s"expected a parquet corruption error, got: $e")
  }

  test("opt-in quarantine: ignoreCorruptFiles reads the healthy subset") {
    val expected = spark.read.parquet(s"$sf/documents.parquet").count()
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val got = spark.read.parquet(dir).count()
      assert(got === expected,
        "healthy rows must survive the corrupt sibling untouched")
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
  }
}
