package graft

import graft.operators.Constraints

/** The data-quality gate: all rules pass on the clean synthetic corpus,
  * and — the part the clean corpus cannot show — every rule individually
  * fires with the exact violation count on seeded corruption.
  */
class ConstraintsSpec extends SparkTestBase {
  import spark.implicits._

  test("synthetic corpus: 10 rules pass; the audit catches the real PK defect") {
    val rows = Constraints.constraintAudit(spark, sf)
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length === 11)
    rows.foreach { case (rule, n, v, passed) =>
      assert(n > 0L, rule)
      if (rule == "lineitem_pk_unique") {
        // the generator does NOT enforce the TPC-H lineitem PK — the
        // audit's whole job is to surface exactly this; cross-check the
        // violation count independently
        val li = graft.sources.Tables.lineitem(spark, sf)
        val expected = li.count() -
          li.select("l_orderkey", "l_linenumber").distinct().count()
        assert(v === expected, rule)
        assert(!passed && v > 0L, rule)
      } else {
        assert(v === 0L, rule)
        assert(passed, rule)
      }
    }
  }

  test("every rule fires with the exact count on seeded corruption") {
    val orders = Seq[(Long, Option[Long], String, Double)](
      (1L, Some(10L), "O", 100.0),
      (1L, Some(10L), "O", 100.0),   // duplicate orderkey (1 extra row)
      (2L, None, "F", 50.0),         // null custkey
      (3L, Some(10L), "X", 50.0),    // bad status
      (4L, Some(10L), "P", -5.0),    // non-positive price
      (5L, Some(99L), "O", 10.0)     // orphan custkey (no customer 99)
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val customer = Seq(10L).toDF("c_custkey")
    val lineitem = Seq[(Option[Long], Long, Double, Double)](
      (Some(1L), 1L, 5.0, 0.05),
      (Some(1L), 1L, 5.0, 0.05),     // duplicate (orderkey, linenumber)
      (Some(2L), 1L, 0.0, 0.05),     // non-positive quantity
      (Some(3L), 1L, 5.0, 0.5),      // discount out of range
      (Some(77L), 1L, 5.0, 0.05),    // orphan orderkey (no order 77)
      (None, 1L, 5.0, 0.05),         // NULL-keyed duplicate pair: the
      (None, 1L, 5.0, 0.05)          // struct-distinct pk rule must see it
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val got = Constraints.auditOf(orders, customer, lineitem)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("orders_orderkey_unique") === ((6L, 1L, false)))
    assert(got("orders_custkey_complete") === ((6L, 1L, false)))
    assert(got("orders_totalprice_positive") === ((6L, 1L, false)))
    assert(got("orders_status_domain") === ((6L, 1L, false)))
    // 2 = the orphan key 99 AND the NULL row: a null key never finds a
    // match, so LEFT ANTI keeps it and NOT EXISTS counts it — both
    // engines agree it fails referential integrity (and completeness
    // flags it separately)
    assert(got("orders_custkey_fk") === ((6L, 2L, false)))
    // 2 = the (1,1) duplicate AND one of the two (NULL,1) rows: the
    // struct-based distinct counts the NULL-keyed group (struct non-NULL,
    // NULL components equal inside DISTINCT), exactly like DuckDB's
    // row-value count(DISTINCT (a, b)) — a plain countDistinct(a, b)
    // would have dropped both NULL rows and reported 3
    assert(got("lineitem_pk_unique") === ((7L, 2L, false)))
    assert(got("lineitem_orderkey_complete") === ((7L, 2L, false)))
    assert(got("lineitem_linenumber_complete") === ((7L, 0L, true)))
    assert(got("lineitem_quantity_positive") === ((7L, 1L, false)))
    assert(got("lineitem_discount_range") === ((7L, 1L, false)))
    // 3 = the orphan 77 plus both NULL-keyed rows (NULL never matches)
    assert(got("lineitem_orderkey_fk") === ((7L, 3L, false)))
  }
}
