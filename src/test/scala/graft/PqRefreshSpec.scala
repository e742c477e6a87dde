package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Incremental PQ-codes maintenance: append → delta-encode ONLY the new
  * file (base codes files byte-untouched), shrink → honest full rebuild,
  * and in every state the artifact equals a from-scratch encode.
  */
class PqRefreshSpec extends SparkTestBase {

  private def partFiles(dir: String): Map[String, (Long, Long)] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> (f.length, f.lastModified))
      .toMap

  private def codesRows(path: String): Set[String] =
    spark.read.parquet(path)
      .select(col("vec_id"), col("cent_id"),
        concat_ws(",", col("codes")).as("cs"))
      .collect().map(_.toString).toSet

  test("append → delta encode only; shrink → full rebuild; both ≡ rebuild") {
    val d = java.nio.file.Files.createTempDirectory("graft_pqref_spec_")
      .toFile.getAbsolutePath
    try {
      val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      raw.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")

      val p1 = Similarity.ensurePqCodesIncremental(spark, d)
      assert(Similarity.lastPqRefreshMode.get == "full")
      val before = partFiles(p1)
      assert(before.nonEmpty)

      // unchanged corpus → served as-is
      assert(Similarity.ensurePqCodesIncremental(spark, d) == p1)
      assert(Similarity.lastPqRefreshMode.get == "current")

      // append a batch → the SAME artifact path grows by delta encoding;
      // every pre-existing codes file must stay byte-identical
      raw.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 10000)
        .coalesce(1).write.mode("append").parquet(s"$d/embeddings.parquet")
      val p2 = Similarity.ensurePqCodesIncremental(spark, d)
      assert(p2 == p1, "append must refresh in place, not re-generate")
      assert(Similarity.lastPqRefreshMode.get == "delta")
      val after = partFiles(p1)
      before.foreach { case (name, sig) =>
        assert(after.get(name).contains(sig),
          s"base codes file $name was rewritten by the delta refresh")
      }
      assert(after.size > before.size, "delta must append new codes files")

      // delta ≡ rebuild: the grown artifact equals a from-scratch encode
      // of the mutated corpus (the sig-keyed full-build artifact)
      val full = Similarity.ensurePqCodes(spark, d)
      assert(codesRows(p2) == codesRows(full))

      // shrink (rewrite with fewer rows) → stored codes describe vanished
      // rows; the ensure must fall back to a FULL rebuild in a fresh
      // generation
      raw.filter(col("vec_id") % 2 === 0)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      val p3 = Similarity.ensurePqCodesIncremental(spark, d)
      assert(Similarity.lastPqRefreshMode.get == "full")
      assert(p3 != p1, "a shrink must land in a fresh generation")
      assert(codesRows(p3) == codesRows(Similarity.ensurePqCodes(spark, d)))
    } finally graft.util.Scratch.deleteRecursively(d)
  }
}
