package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.operators.{IndexQueries, Indexer, Skew}
import graft.sources.Tables

class SkewTopKSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin output == plain join output") {
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select(
      col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = l.join(o, "l_orderkey")
      .select("l_orderkey", "l_quantity", "o_orderpriority")
      .as[(Long, Double, String)].collect().sorted
    val salted = Skew.saltedJoin(l, o, "l_orderkey", 8)
      .select("l_orderkey", "l_quantity", "o_orderpriority")
      .as[(Long, Double, String)].collect().sorted
    assert(salted.sameElements(plain))
  }

  test("TopKAggregator == window row_number top-k per doc") {
    val agg = new TopKAggregator(3).toColumn
    val viaAggregator = Indexer.postings(spark, sf)
      .as[(String, Long, Long)]
      .map { case (term, doc, tf) => (doc, (tf, term)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top_terms"))
      .collect().toMap
    val viaWindow = IndexQueries.topTermsPerDoc(spark, sf, 3)
      .select("doc_id", "term", "rnk").as[(Long, String, Int)].collect()
      .groupBy(_._1)
      .map { case (d, rs) => d -> rs.sortBy(_._3).map(_._2).toSeq }
    assert(viaAggregator === viaWindow)
  }
}
