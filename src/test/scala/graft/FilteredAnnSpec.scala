package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Filtered ANN: the metadata predicate must prune BEFORE ADC scoring —
  * pushed into the codes-artifact parquet scan, never applied to the
  * top-k afterwards (post-filtering wastes ADC work and under-fills k).
  */
class FilteredAnnSpec extends SparkTestBase {

  test("the label predicate is PUSHED to the codes scan, below ADC scoring") {
    val df = Similarity.filteredAnnTopK(spark, sf, 10, 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the codes artifact scan (vec_id, label, cent_id, codes) must carry
    // the pushed filter — that is what makes the predicate prune row
    // groups at 100 TB instead of filtering decoded rows after ADC
    assert(plan.contains("LessThanOrEqual(label,4)"),
      s"label predicate not pushed to the codes scan:\n$plan")
    // and it must land on the CODES scan (the relation carrying cent_id),
    // not merely on some embeddings scan
    val codesScan = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("cent_id"))
      .mkString("\n")
    assert(codesScan.contains("LessThanOrEqual(label,4)"),
      s"pushed filter missing from the codes scan line:\n$codesScan")
  }

  test("results = ivfPqTopK semantics restricted to passing vectors") {
    import spark.implicits._
    // every returned neighbor passes the predicate
    val got = Similarity.filteredAnnTopK(spark, sf, 10, 10).collect()
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(labels(r.getLong(1)) <= 4,
        s"neighbor ${r.getLong(1)} fails the predicate")
    }
    // and no query returns a vector the unfiltered pipeline would only
    // reach by scoring excluded rows: the filtered candidate pool is a
    // subset, so per query the filtered cosines are <= the unfiltered
    // best at each rank among passing vectors — sanity: rnk is dense 1..k
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
  }
}
