package graft

import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.plans.{AsOfJoin, AsOfJoinExec, BroadcastAsOfJoinExec}

/** The native as-of join operator: semantics against both the declarative
  * window formulation and hand-built ground truth, and the physical
  * contract (the exec node plans, with exactly the two co-partitioning
  * exchanges a SortMergeJoin would pay).
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("native as-of ≡ union+window formulation on the events table") {
    val native = Events.asofPurchaseViewNative(spark, sf)
      .select("user_id", "p_id", "p_ms", "last_view_ms")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq.sorted
    val window = Events.asofPurchaseView(spark, sf)
      .select("user_id", "p_id", "p_ms", "last_view_ms")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq.sorted
    assert(native === window)
    assert(native.nonEmpty)
  }

  test("physical plan: AsOfJoinExec with exactly 2 exchanges, sorted inputs") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Events.asofPurchaseViewNative(spark, sf)
        .queryExecution.executedPlan
      val execs = plan.collect { case a: AsOfJoinExec => a }
      assert(execs.length === 1, s"expected one AsOfJoinExec in:\n$plan")
      // the merge needs only the two key co-partitioning exchanges (plus
      // none for the final orderBy's range exchange — count ≤ 3 total)
      val shuffles = plan.collect { case _: ShuffleExchangeExec => 1 }.sum
      assert(shuffles <= 3, s"as-of plans $shuffles shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("hand-built ground truth: hot key, ties, and no-match nulls") {
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 7L, "q1"),                       // key with no right rows
      (3L, 100L, "r1"), (3L, 100L, "r2")    // tie on time
    ).toDF("k", "t", "ltag")
    val right = Seq(
      (1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"),
      (3L, 100L, "x"), (3L, 99L, "y"),
      (4L, 1L, "z")                          // right-only key
    ).toDF("k2", "t2", "rtag")
    val out = AsOfJoin.merge(left, right, Seq(("k", "k2")), "t", "t2")
      .select("k", "t", "ltag", "t2", "rtag")
      .as[(Long, Long, String, Option[Long], Option[String])]
      .collect().toSeq.sortBy(r => (r._1, r._2, r._3))
    assert(out === Seq(
      (1L, 5L, "p0", Some(5L), Some("a")),    // inclusive rt <= lt
      (1L, 10L, "p1", Some(10L), Some("b")),
      (1L, 20L, "p2", Some(15L), Some("c")),
      (2L, 7L, "q1", None, None),
      (3L, 100L, "r1", Some(100L), Some("x")),
      (3L, 100L, "r2", Some(100L), Some("x"))
    ))
  }

  test("NULL keys and NULL times never match (SQL equality, DuckDB ASOF)") {
    val left = Seq[(Option[Long], Option[Long], String)](
      (Some(1L), Some(10L), "ok"),     // normal match
      (None, Some(10L), "nullkey"),    // NULL key: must NOT match the
                                       // right NULL-key row
      (Some(1L), None, "nulltime")     // NULL time: no 'as of NULL'
    ).toDF("k", "t", "ltag")
    val right = Seq[(Option[Long], Option[Long], String)](
      (Some(1L), Some(5L), "a"),
      (None, Some(1L), "rnullkey"),    // unreachable: NULL right key
      (Some(1L), None, "rnulltime")    // unreachable: would unbox to 0L
                                       // and wrongly serve as epoch-0
    ).toDF("k2", "t2", "rtag")
    val out = AsOfJoin.merge(left, right, Seq(("k", "k2")), "t", "t2")
      .select("ltag", "rtag").as[(String, Option[String])]
      .collect().toMap
    assert(out === Map(
      "ok" -> Some("a"), "nullkey" -> None, "nulltime" -> None))
  }

  test("skewed key: one key owning the whole right side stays linear-correct") {
    val left = (0L until 200L).map(i => (1L, i * 10L)).toDF("k", "t")
    val right = (0L until 1000L).map(i => (1L, i)).toDF("k2", "t2")
    val out = AsOfJoin.merge(left, right, Seq(("k", "k2")), "t", "t2")
      .select("t", "t2").as[(Long, Option[Long])].collect().toMap
    (0L until 200L).foreach { i =>
      val lt = i * 10
      assert(out(lt) === Some(math.min(lt, 999L)))
    }
  }

  test("planner auto-selects: stats-small right broadcasts, -1 disables") {
    val left = (0L until 100L).map(i => (i % 5, i)).toDF("k", "t")
    val right = Seq((0L, 1L, "a"), (1L, 2L, "b")).toDF("k2", "t2", "rtag")
    def planOf() = AsOfJoin(left, right, Seq(("k", "k2")), "t", "t2")
      .queryExecution.executedPlan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // unhinted + tiny LocalRelation stats → the planner must pick the
      // broadcast exec on its own (the JoinSelection contract)
      assert(planOf().collect {
        case b: BroadcastAsOfJoinExec => b }.length === 1)
      // threshold -1 disables auto-broadcast exactly as for equi-joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try assert(planOf().collect { case a: AsOfJoinExec => a }.length === 1)
      finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("broadcast variant ≡ shuffled merge on every semantic case") {
    // reuse the hard cases: hot key, ties, no-match, NULL keys/times —
    // the broadcast exec must be observationally identical
    val left = Seq[(Option[Long], Option[Long], String)](
      (Some(1L), Some(10L), "p1"), (Some(1L), Some(20L), "p2"),
      (Some(1L), Some(5L), "p0"), (Some(2L), Some(7L), "q1"),
      (Some(3L), Some(100L), "r1"), (Some(3L), Some(100L), "r2"),
      (None, Some(10L), "nullkey"), (Some(1L), None, "nulltime")
    ).toDF("k", "t", "ltag")
    val right = Seq[(Option[Long], Option[Long], String)](
      (Some(1L), Some(5L), "a"), (Some(1L), Some(10L), "b"),
      (Some(1L), Some(15L), "c"), (Some(3L), Some(100L), "x"),
      (Some(3L), Some(99L), "y"), (Some(4L), Some(1L), "z"),
      (None, Some(1L), "rnullkey"), (Some(1L), None, "rnulltime")
    ).toDF("k2", "t2", "rtag")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("ltag", "t2", "rtag")
        .as[(String, Option[Long], Option[String])].collect().toSeq.sorted
    val shuffled = run(AsOfJoin.merge(left, right, Seq(("k", "k2")), "t", "t2"))
    val bcast = run(AsOfJoin.broadcast(left, right, Seq(("k", "k2")), "t", "t2"))
    assert(bcast === shuffled)
    assert(bcast.nonEmpty)
  }

  test("broadcast plan: fact side unmoved — no shuffle below the join") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Events.prevHourRate(spark, sf).queryExecution.executedPlan
      val execs = plan.collect { case b: BroadcastAsOfJoinExec => b }
      assert(execs.length === 1, s"expected BroadcastAsOfJoinExec in:\n$plan")
      val join = execs.head
      // the probe (left) subtree must contain NO exchange of any kind:
      // the whole point is that the 100 TB side streams out of its scan
      assert(join.left.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        s"fact side was shuffled:\n$plan")
      // the dimension side rides exactly one broadcast exchange (the
      // hourly cell aggregation above it may shuffle its tiny input)
      assert(join.right.collect { case b: BroadcastExchangeLike => b }.size === 1,
        s"dimension side not broadcast:\n$plan")
      // whole plan: hourly agg + final orderBy are the only shuffles
      val shuffles = plan.collect { case _: ShuffleExchangeExec => 1 }.sum
      assert(shuffles <= 2, s"broadcast as-of plans $shuffles shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("broadcast as-of on events ≡ the same query through the shuffled exec") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("unix_millis(ts)").as("ms"))
    val hourly = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type").as("h_type"),
        expr("unix_millis(ts) div 3600000").as("hour_id"))
      .agg(count(lit(1)).as("prev_n"))
      .select(col("h_type"), ((col("hour_id") + 1) * 3600000L).as("h_ms"),
        col("prev_n"))
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("event_id", "h_ms", "prev_n")
        .as[(Long, Option[Long], Option[Long])].collect().toSeq.sorted
    val viaBcast = run(AsOfJoin.broadcast(ev, hourly,
      Seq(("event_type", "h_type")), "ms", "h_ms"))
    val viaMerge = run(AsOfJoin.merge(ev, hourly,
      Seq(("event_type", "h_type")), "ms", "h_ms"))
    assert(viaBcast === viaMerge)
    assert(viaBcast.nonEmpty)
  }
}
