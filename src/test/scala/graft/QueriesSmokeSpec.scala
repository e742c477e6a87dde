package graft

/** Every declared query must execute at sf0.001 with rows and a stable
  * schema — the fast regression net for the whole SparkEntry surface.
  */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with non-degenerate output") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(df.columns.nonEmpty)
      // empty results are legal only for similarity-threshold queries,
      // which may have no qualifying pairs at the smallest scale
      if (!Set("q_neardup_jaccard", "q_minhash_lsh", "q_cust_no_orders")
            .contains(name))
        assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
