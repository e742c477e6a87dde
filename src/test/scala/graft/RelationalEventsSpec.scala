package graft

import org.apache.spark.sql.functions.{col, unix_millis}

import graft.operators.{Events, Relational}
import graft.sources.Tables

class RelationalEventsSpec extends SparkTestBase {
  import spark.implicits._

  test("q1 pricing: group count bounded by flag×status combos; totals positive") {
    val rows = Relational.q1Pricing(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q3 returns at most 10 rows sorted by revenue desc") {
    val rev = Relational.q3TopUnshipped(spark, sf)
      .select("revenue").as[Double].collect()
    assert(rev.length <= 10)
    assert(rev.sorted(Ordering[Double].reverse).sameElements(rev))
  }

  test("q5 region revenue covers only ASIA nations") {
    val rows = Relational.q5RegionRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select("n_name").as[String].collect().toSet
    assert(rows.map(_.getAs[String]("n_name")).toSet.subsetOf(asiaNations))
  }

  test("correlated scalar subqueries are fully decorrelated to agg+join") {
    val q = Relational.partsAboveBrandAvg(spark, sf)
    // Catalyst's RewriteCorrelatedScalarSubquery must leave NO subquery
    // expression in the optimized plan — a surviving correlated subquery
    // would re-execute per outer row, the classic scan-time scale-killer
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"correlated subquery survived optimization:\n$optimized")
    // and the result is internally consistent: every kept part beats its
    // brand average. The query's WHERE compares exact DECIMAL(12,2); a
    // double-arithmetic re-check could flake right at the boundary, so
    // round both sides back to scale-2 BigDecimal (the doubles are exact
    // images of decimal(12,2) values, so the rounding recovers them)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def dec2(d: Double) =
        BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert(dec2(r.getAs[Double]("p_retailprice")) * r.getAs[Long]("brand_n")
        > dec2(r.getAs[Double]("brand_sum")))
    }
  }

  test("top supplier: winner's revenue equals the recomputed maximum") {
    val rows = Relational.topRevenueSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length === 1, "all winners must share the max revenue")
    // distinct suppliers, sorted
    val ids = rows.map(_.getAs[Long]("s_suppkey")).toSeq
    assert(ids === ids.sorted && ids.distinct.length === ids.length)
  }

  test("large orders: every returned order clears the quantity threshold") {
    val rows = Relational.largeQuantityOrders(spark, sf, 250).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("sum_qty") > 250.0))
    // ordered by totalprice desc
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices.sliding(2).forall(s => s.head >= s.last))
  }

  test("nation trade: only the two requested nation pairings appear") {
    val rows = Relational.nationTrade(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_19", "NATION_11"), ("NATION_11", "NATION_19"))))
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("sessionize: sessions partition events; durations respect the 30-min gap") {
    val sessions = Events.sessionize(spark, sf).collect()
    val totalEvents = Tables.events(spark, sf).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === totalEvents)
    sessions.foreach { r =>
      val dur = r.getAs[Long]("duration_s")
      val n = r.getAs[Long]("n_events")
      assert(dur >= 0)
      // max possible span: every consecutive gap just under 30 min
      assert(dur <= (n - 1) * 30 * 60 + 1,
        s"session longer than (n-1)×gap: $r")
    }
  }

  test("RANGE-frame activity window: self-inclusive and monotone vs frame") {
    val rows = Events.userActivityWindow(spark, sf, maxUser = 10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events_1h") >= 1, s"frame excludes self: $r")
    }
    // an event's frame count can never exceed the user's total events
    val totals = Tables.events(spark, sf).filter(col("user_id") < 10)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events_1h") <= totals(r.getAs[Long]("user_id")))
    }
  }

  test("keyless range join: bin-bucketed counts == naive nested-loop counts") {
    val binned = Events.errorWindowClicks(spark, sf, 10).collect()
      .map(r => r.getAs[Long]("win_id") -> r.getAs[Long]("n_clicks")).toMap
    // naive reference: the O(W×C) product the binning avoids, safe at sf0.001
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms")).collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
      .map(_.getAs[Long]("ms"))
    val naive = ev.filter(_.getAs[String]("event_type") == "error").map { w =>
      val lo = w.getAs[Long]("ms")
      w.getAs[Long]("event_id") ->
        clicks.count(c => c >= lo && c < lo + 600000L).toLong
    }.toMap
    assert(binned === naive)
    // zero-click windows must be present, not dropped by the inner join
    assert(naive.values.exists(_ == 0L) ==
      binned.values.exists(_ == 0L))
  }

  test("type shares sum to ~1 and users are bounded") {
    val rows = Events.typeShares(spark, sf).collect()
    val total = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(total - 1.0) < 1e-4)
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    rows.foreach(r => assert(r.getAs[Long]("n_users") <= nUsers))
  }

  test("hourlyAnomalies: fraction-free flag ≡ the |z| > 3 rule, brute-forced") {
    val counts = Tables.events(spark, sf)
      .select((unix_millis(col("ts")) / 3600000L).cast("long").as("h"))
      .groupBy("h").count().as[(Long, Long)].collect().sortBy(_._1).toSeq
    val byHour = counts.toMap
    val hoursSorted = counts.map(_._1)
    val expected = hoursSorted.zipWithIndex.flatMap { case (h, i) =>
      if (i < 24) None else {
        val trail = hoursSorted.slice(i - 24, i).map(byHour)
        val n = byHour(h).toDouble
        val mean = trail.sum.toDouble / 24
        val varr = trail.map(x => (x - mean) * (x - mean)).sum / 24
        Some(h -> (math.abs(n - mean) > 3 * math.sqrt(varr)))
      }
    }.toMap
    val got = Events.hourlyAnomalies(spark, sf)
      .select("hour_id", "is_anomaly").as[(Long, Boolean)].collect()
    assert(got.length === expected.size)
    got.foreach { case (h, flag) =>
      assert(flag === expected(h), s"hour $h")
    }
  }

  test("streaming anomaly detector converges to the batch report") {
    val batch = Events.hourlyAnomalies(spark, sf)
      .collect().map(_.toString).toSeq
    val streamed = graft.streaming.StreamingSketch
      .hourlyAnomaliesAvailableNow(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
