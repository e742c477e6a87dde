package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time analytics over the `events` table (SURVEY.md §2.2): tumbling
  * windows, sessionization, and share-of-total rates — the batch forms of
  * the operators `graft.streaming` runs incrementally.
  *
  * Timestamp contract: the parquet column is nanosecond-precision; Spark
  * truncates to µs, DuckDB keeps ns. Outputs therefore never expose a raw
  * timestamp — hours go out as strings, instants as epoch milliseconds
  * (both engines floor identically).
  */
object Events {

  /** Tumbling 1-hour window per event type: counts + exact decimal sums. */
  def hourlyRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour", "event_type")

  /** HOURLY ANOMALY FLAGS — time-series outlier detection on the event
    * feed without a single floating-point division: each hour's count n
    * is tested against the 24 MOST RECENT NON-EMPTY hour buckets (a ROWS
    * frame over the hour-cell table — an hour with zero events has no
    * bucket row, so the 24 trailing rows can span more than 24 calendar
    * hours across gaps; [[robustHourlyAnomalies]] is the calendar-window
    * twin that joins explicit hour_id offsets instead) via the z² > 9
    * rule (|z| > 3) cleared of fractions —
    *   (k·n − S)² > 9·(k·SS − S²)
    * with S = Σn, SS = Σn² over the k trailing buckets — ALL integer
    * arithmetic in DECIMAL(38,0), so the flag is bit-identical on any
    * engine (no sqrt, no mean round-off). Shape: one hour-bucket
    * aggregation of the feed, then a trailing window over the HOUR table
    * — thousands of rows regardless of feed volume (the same
    * cell-table-sized global window as the histogram-percentile cum
    * scan), so the unpartitioned frame is metadata work, not a funnel.
    */
  def hourlyAnomalies(spark: SparkSession, sfDir: String): DataFrame =
    anomaliesOfHourCounts(Tables.events(spark, sfDir)
      // integer floor division (`div`), not Column `/` (double division
      // + cast): exact for any epoch-ms, not just < 2^53 — the repo-wide
      // rule from Packing.scala
      .groupBy(expr("unix_millis(ts) div 3600000").as("hour_id"))
      .agg(count(lit(1)).as("n")))

  /** The anomaly test over an explicit (hour_id, n) cell table — shared
    * by the batch detector above and the streaming-state twin
    * ([[graft.streaming.StreamingSketch.hourlyAnomaliesAvailableNow]]).
    */
  private[graft] def anomaliesOfHourCounts(hours: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val trailing = Window.orderBy(col("hour_id")).rowsBetween(-24, -1)
    hours
      .withColumn("k", count(lit(1)).over(trailing))
      .withColumn("s", sum(col("n")).over(trailing))
      .withColumn("ss", sum(col("n") * col("n")).over(trailing))
      .filter(col("k") === 24) // flags only with a full trailing day
      .withColumn("num",
        expr("CAST(k * n - s AS DECIMAL(38,0)) * CAST(k * n - s AS DECIMAL(38,0))"))
      .withColumn("den",
        expr("9 * (CAST(k AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)"))
      .select(col("hour_id"), col("n"), col("s").as("trail_sum"),
        col("ss").as("trail_sumsq"),
        (col("num") > col("den")).as("is_anomaly"))
      .orderBy("hour_id")
  }

  /** q_ewma_anomaly: exponentially-weighted forecast + Poisson gate over
    * the hourly count series — the RECENCY-weighted twin of
    * [[hourlyAnomalies]] (whose flat 24 h z-score reacts a full day late
    * to a level shift). Forecast for hour t is the α=½ EWMA of the 16
    * preceding rows: weight 2^(16−i) for the i-th lag, so the scaled sum
    * S = Σ n_{t−i}·2^(16−i) and the constant normalizer W = 2^16−1 are
    * EXACT BIGINTs — the one double in the output is S/W rounded 6dp.
    * The anomaly test |n − S/W| > 3·√(S/W) (3σ under Poisson(S/W))
    * clears denominators to the pure integer comparison
    * (n·W − S)² > 9·W·S — decimal(38) exact, no float drift ever.
    *
    * Scale: the hour-count table is O(hours) — metadata-sized at any
    * corpus scale (a year is 8,760 rows) — so the single ordered window
    * the 16 lags share is the right plan; the corpus-sized work is the
    * one groupBy(hour) count, identical to [[hourlyAnomalies]].
    *
    * Gap semantics (DELIBERATE divergence from
    * [[robustHourlyAnomalies]]'s calendar-ranged window): the lags are
    * over ROWS of the non-empty-hour series, so a calendar gap is
    * compressed — the first hour after a quiet stretch is forecast from
    * pre-gap traffic and judged against it. For an EWMA that is often
    * the wanted behavior (an idle system's "expected rate" is its last
    * active rate, and densifying with n=0 hours would drag every
    * post-gap forecast toward zero and flag the RESUMPTION instead);
    * callers needing calendar semantics should densify hour_id before
    * the window, as the robust twin's rangeBetween does implicitly.
    * The oracle replays the same row-lag rule, so the divergence is
    * pinned, not accidental.
    */
  def ewmaAnomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val byHour = Window.orderBy(col("hour_id"))
    val lags = (1 to 16).map(i =>
      lag(col("n"), i).over(byHour) * lit(1L << (16 - i)))
    Tables.events(spark, sfDir)
      .groupBy(expr("unix_millis(ts) div 3600000").as("hour_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("k", count(lit(1)).over(byHour.rowsBetween(-16, -1)))
      .withColumn("s", lags.reduce(_ + _))
      .filter(col("k") === 16) // forecast only with a full lag window
      .withColumn("num", expr(
        "CAST(n * 65535 - s AS DECIMAL(38,0)) * CAST(n * 65535 - s AS DECIMAL(38,0))"))
      .withColumn("den", expr("9 * CAST(65535 AS DECIMAL(38,0)) * s"))
      .select(col("hour_id"), col("n"), col("s").as("ewma_scaled"),
        round(col("s").cast("double") / 65535.0, 6).as("forecast"),
        (col("num") > col("den")).as("is_anomaly"))
      .orderBy("hour_id")
  }

  /** RANGE-frame moving aggregate — the event-TIME window frame (not row
    * count): for each event of the audited user subset, how many events
    * and how much value the SAME user produced in the preceding hour,
    * `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW` expressed
    * as a millisecond rangeBetween. The per-user frame scan rides ONE
    * user-keyed exchange; the user filter is pushed to the parquet scan,
    * so work is proportional to the audited subset, not the feed. Value
    * sums run in decimal so frame-internal addition order can't wobble
    * the double (the oracle computes the identical frame).
    */
  def userActivityWindow(spark: SparkSession, sfDir: String,
                         maxUser: Long = 30): DataFrame = {
    val byUserRange = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"))
      .rangeBetween(-3600000L, 0L)
    Tables.events(spark, sfDir)
      .filter(col("user_id") < maxUser)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"),
        col("value").cast("decimal(14,2)").as("v"))
      .withColumn("n_events_1h", count(lit(1)).over(byUserRange))
      .withColumn("value_1h",
        sum(col("v")).over(byUserRange).cast("double"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ms"), col("n_events_1h"), col("value_1h"))
      .orderBy("event_id")
  }

  /** Sessionization: a session breaks after a 30-minute inactivity gap.
    * lag → gap flag → running sum = session number (one shuffle on
    * user_id; the standard sessionize-without-UDF shape).
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    // order by the SAME key the oracle uses (epoch ms, event_id) — raw ts
    // is µs here vs ns in DuckDB, so sub-ms ordering could diverge
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    Tables.events(spark, sfDir)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ms")).as("session_start_ms"),
        max(col("ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        ((max(col("ms")) - min(col("ms"))) / 1000).cast("long").as("duration_s"))
      .orderBy("user_id", "session_no")
  }

  /** Sliding 2-hour windows advancing hourly: each event lands in two
    * overlapping windows (Spark's `window(ts, len, slide)`; the oracle
    * enumerates the two hour-aligned starts explicitly).
    */
  def slidingWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("win_start", "event_type")

  /** Hour-of-day × event-type pivot (counts). Fixed pivot value list so
    * the output schema is static; absent cells coalesce to 0 to match
    * SQL's FILTER-ed counts.
    */
  def eventPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(spark, sfDir)
      .withColumn("hr", hour(col("ts")))
      .groupBy(col("hr"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    pivoted
      .select(col("hr") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("hr")
  }

  /** Per-type share of total events + distinct-user reach. The total comes
    * from a broadcast 1-row aggregate of the per-type counts, NOT an
    * empty-partition window (`sum(n).over()`): a global window funnels all
    * rows through one partition — harmless on 5 post-agg rows, a foot-gun
    * if the group-by key ever grows.
    */
  def typeShares(spark: SparkSession, sfDir: String): DataFrame = {
    val perType = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    val total = perType.agg(sum(col("n")).as("n_total"))
    perType.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n").cast("double") / col("n_total"), 6))
      .select("event_type", "n", "n_users", "share")
      .orderBy("event_type")
  }

  /** As-of join: for every purchase event, the most recent prior (or
    * simultaneous) view event of the same user; DuckDB's native ASOF JOIN
    * is the oracle.
    *
    * Shape: ONE window pass over the union of both event streams — views
    * and purchases interleave per user ordered by (ms, kind, event_id),
    * views sorting BEFORE purchases at equal ms so a simultaneous view
    * counts; `last(v_ms, ignoreNulls)` over rows-unbounded-preceding gives
    * each purchase its latest view at or before it. Linear per user, one
    * shuffle. The obvious alternative — `purchases ⋈ views ON user AND
    * v_ms <= p_ms` then max-per-purchase — generates P×V intermediate rows
    * per user before aggregating, a blow-up on any hot user at scale.
    */
  def asofPurchaseView(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "view"))
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_view_ms",
        last(when(col("is_purchase") === 0, col("ms")), ignoreNulls = true)
          .over(byUser))
      .filter(col("is_purchase") === 1)
      .select(
        col("user_id"), col("event_id").as("p_id"), col("ms").as("p_ms"),
        col("last_view_ms"),
        (col("ms") - col("last_view_ms")).as("gap_ms"))
      .orderBy("user_id", "p_id")
  }

  /** The SAME as-of semantics executed by the NATIVE operator
    * ([[graft.plans.AsOfJoin]]): purchases as-of-join the view stream on
    * user_id with `view_ms <= purchase_ms`. Where [[asofPurchaseView]]
    * funnels both streams through one union schema and a window buffer,
    * the custom physical operator co-partitions the two relations on the
    * key, sorts each partition by (key, time) — the planner inserts both,
    * exactly as for a SortMergeJoin — and then a single forward merge
    * with ONE buffered right row joins them in |P|+|V| time and O(1)
    * memory per partition. The oracle is DuckDB's own ASOF LEFT JOIN.
    */
  def asofPurchaseViewNative(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("ms", unix_millis(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ms").as("p_ms"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ms").as("last_view_ms"))
    // .merge pins the shuffled-merge exec: it is the operator under
    // test here, and the view side only looks broadcast-small at test SF
    graft.plans.AsOfJoin.merge(p, v, Seq(("user_id", "v_user")),
        "p_ms", "last_view_ms")
      .select(col("user_id"), col("p_id"), col("p_ms"), col("last_view_ms"),
        (col("p_ms") - col("last_view_ms")).as("gap_ms"))
      .orderBy("user_id", "p_id")
  }

  /** Views within the hour before each purchase — an INTERVAL JOIN,
    * executed with time-bin bucketing instead of a per-user cross join:
    * each view maps to its hour bin, each purchase explodes to the (at
    * most two) bins its 1-hour lookback can touch, the join runs on
    * (user_id, bin) equality, and the exact range predicate filters the
    * bounded candidate set. Candidates per purchase ≈ that user's views
    * in 2 hour-bins — independent of history length, so the plan survives
    * an unbounded event log where the naive range join (user_id equality
    * + inequality only) degenerates to P×V per user.
    */
  def viewsBeforePurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val HourMs = 3600000L
    val ev = Tables.events(spark, sfDir).withColumn("ms", unix_millis(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ms").as("v_ms"),
        floor(col("ms") / HourMs).as("bin"))
    val pBinned = p.withColumn("bin",
      explode(array(floor(col("ms") / HourMs), floor(col("ms") / HourMs) - 1)))
    val counts = pBinned.join(v, Seq("user_id", "bin"))
      .filter(col("v_ms") > col("ms") - HourMs && col("v_ms") <= col("ms"))
      .groupBy("event_id").agg(count(lit(1)).as("n_views"))
    p.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ms").as("purchase_ms"),
        coalesce(col("n_views"), lit(0L)).as("n_views_1h"))
      .orderBy("event_id")
  }

  /** Clicks (from ANY user) inside the 10 minutes after each error event —
    * a KEYLESS range join, the shape Catalyst can only execute as a
    * BroadcastNestedLoopJoin (O(windows × points), and only if one side
    * broadcasts). Executed instead with time-bin bucketing: bin width =
    * window length, so each window touches at most 2 bins and each click
    * exactly 1; the join runs on bin EQUALITY (a plain shuffle hash join)
    * and the exact range predicate filters the bounded candidate set.
    * Candidates per window ≈ clicks in 2 bins — rate-bound, independent of
    * log length, so the plan survives an unbounded event log at 100 TB
    * where the nested-loop product is quadratic. No dedup pass is needed:
    * a click lives in exactly one bin, so each (window, click) candidate
    * appears exactly once. Zero-click windows are preserved by the final
    * left join against the window relation (both sides shuffle on win_id,
    * output-sized).
    */
  def errorWindowClicks(spark: SparkSession, sfDir: String,
                        windowMinutes: Int = 10): DataFrame = {
    val WinMs = windowMinutes * 60000L
    val ev = Tables.events(spark, sfDir).withColumn("ms", unix_millis(col("ts")))
    val win = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"), col("ms").as("lo_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ms").as("c_ms"), floor(col("ms") / WinMs).as("bin"))
    val winBinned = win.withColumn("bin",
      explode(array(floor(col("lo_ms") / WinMs),
        floor(col("lo_ms") / WinMs) + 1)))
    val counts = winBinned.join(clicks, Seq("bin"))
      .filter(col("c_ms") >= col("lo_ms") && col("c_ms") < col("lo_ms") + WinMs)
      .groupBy("win_id").agg(count(lit(1)).as("n_clicks"))
    win.join(counts, Seq("win_id"), "left")
      .select(col("win_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy("win_id")
  }

  /** Weekly retention cohorts: users grouped by their first-activity
    * week, counted as retained in each later week they were active.
    * Two aggregations — first-touch per user (one shuffle on user_id),
    * then distinct users per (cohort_week, week_offset) — with the
    * cohort join riding the same user_id partitioning. Weeks are integer
    * epoch-week indexes (ms / 604800000), engine-exact.
    */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val WeekMs = 604800000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(unix_millis(col("ts")) / WeekMs).as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Ordered conversion funnel view → click → purchase: a user reaches
    * stage k+1 only with an event strictly AFTER their stage-k time
    * (first-touch semantics: t1 = first view, t2 = first click > t1,
    * t3 = first purchase > t2). Each stage is one hash aggregation on
    * user_id plus a semi-shaped join against the (shrinking) previous
    * stage — no windows over the whole event log, no funnels through a
    * single partition.
    */
  def conversionFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ms")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ms") > col("t1"))
      .groupBy("user_id").agg(min(col("ms")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ms") > col("t2"))
      .groupBy("user_id").agg(min(col("ms")).as("t3"))
    def stage(df: DataFrame, idx: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_users"))
    stage(v, 1, "view")
      .unionAll(stage(c, 2, "click_after_view"))
      .unionAll(stage(p, 3, "purchase_after_click"))
      .orderBy("stage_idx")
  }

  /** Top-5 most active users by event count, with their span of activity. */
  def topUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(unix_millis(col("ts"))).as("first_ms"),
        max(unix_millis(col("ts"))).as("last_ms"))
      .orderBy(desc("n_events"), col("user_id"))
      .limit(5)

  /** Semi-structured extraction: the events' JSON `props` payload parsed
    * with a declared schema (`from_json`, codegen'd Jackson parse — not a
    * UDF) and aggregated per type. The schema-on-read path every event
    * pipeline needs for the long tail of per-event attributes that never
    * earn a real column; parsing is map-side, the rollup is one shuffle.
    */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_unparsed"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy("event_type")

  /** Time-series gap fill: a complete hour spine per event type (derived
    * from the corpus' own min/max hour, so it needs no parameters), LEFT
    * joined to the hourly rollup; missing hours get n = 0 and CARRY THE
    * LAST OBSERVED total forward (`last(..., ignoreNulls)` over an
    * unbounded-preceding frame — deterministic because (type, hour) is
    * unique). The spine is generated, never scanned: sequence+explode of
    * ~720 hours × |types| rows, broadcast against the aggregated facts —
    * at 100 TB the dense output stays dimension-sized while the fact scan
    * happens once in the rollup.
    */
  def gapFillHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val counts = ev.groupBy(date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type").as("ct"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).as("hour_value"))
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("hour_ts"))
      .crossJoin(ev.select(col("event_type")).distinct())
    val filled = spine
      .join(counts, spine("hour_ts") === counts("hour_ts") &&
        col("event_type") === col("ct"), "left")
      .select(spine("hour_ts"), col("event_type"), col("n"), col("hour_value"))
    val carry = Window.partitionBy("event_type").orderBy("hour_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .select(
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(last(col("hour_value"), ignoreNulls = true).over(carry),
          lit(0).cast("decimal(24,2)")).cast("double").as("carried_value"))
      .orderBy("event_type", "hour")
  }

  /** ROBUST hourly anomaly flags — the median/MAD twin of
    * [[hourlyAnomalies]]'s z² rule: an hour is anomalous when
    * |n − median| > 3·MAD over its trailing 24 CALENDAR hours (median
    * absolute deviation shrugs off the contaminated-window problem that
    * inflates a mean/variance detector's σ after one spike). The nested
    * statistic (MAD needs each window's median first) cannot ride a
    * window frame, so the trailing window materializes as an explode(24
    * offsets)-equi-join of the HOUR CELL TABLE with itself — linear in
    * cells, never a range-condition nested loop — and two percentile
    * aggregations over it. Exactness: medians of 24 longs are halves,
    * MADs quarters — exact binary fractions both engines interpolate
    * identically (percentile ≡ quantile_cont), so the flag is
    * deterministic. Only full windows (k = 24) report.
    */
  def robustHourlyAnomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Tables.events(spark, sfDir)
      .groupBy(expr("unix_millis(ts) div 3600000").as("hour_id"))
      .agg(count(lit(1)).as("n"))
    val p = h
      .withColumn("off", explode(sequence(lit(1), lit(24))))
      .select(col("hour_id"), col("n"),
        (col("hour_id") - col("off")).as("prev_id"))
      .join(h.select(col("hour_id").as("prev_id"), col("n").as("bn")),
        "prev_id")
    val meds = p.groupBy("hour_id", "n").agg(count(lit(1)).as("k"),
      expr("percentile(bn, 0.5)").as("med"))
    val mads = p.join(meds.select("hour_id", "med"), "hour_id")
      .select(col("hour_id"), abs(col("bn") - col("med")).as("dev"))
      .groupBy("hour_id").agg(expr("percentile(dev, 0.5)").as("mad"))
    meds.join(mads, "hour_id").filter(col("k") === 24)
      .select(col("hour_id"), col("n"), col("med"), col("mad"),
        (abs(col("n") - col("med")) > lit(3.0) * col("mad"))
          .as("robust_anomaly"))
      .orderBy("hour_id")
  }

  /** Per-event trailing-rate enrichment via the BROADCAST as-of join
    * ([[graft.plans.BroadcastAsOfJoinExec]]): every event is tagged with
    * its type's count over the most recent fully completed hour. The
    * right side is the hourly cell table keyed on completion instant
    * `(hour_id + 1) · 3600000` — hours × types rows regardless of feed
    * volume, the canonical broadcast dimension. The shuffled merge
    * ([[asofPurchaseViewNative]]) would hash-repartition AND sort the
    * full event feed to join against it; here the planner inserts one
    * BroadcastExchange of the cell table and the feed streams straight
    * out of the scan — zero fact-side movement, the plan that survives a
    * 100 TB event log. An event's own (incomplete) hour never matches:
    * its completion instant is strictly in the event's future.
    */
  def prevHourRate(spark: SparkSession, sfDir: String): DataFrame =
    enrichWithPrevHour(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          expr("unix_millis(ts)").as("ms")),
      hourlyCells(Tables.events(spark, sfDir)))
      .orderBy("event_id")

  /** The broadcast dimension of [[prevHourRate]]: per-type hour cells
    * keyed by completion instant. Shared with the streaming twin
    * ([[graft.streaming.StreamingAsOf]]), which builds it ONCE and
    * probes it from every micro-batch.
    */
  private[graft] def hourlyCells(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type").as("h_type"),
        expr("unix_millis(ts) div 3600000").as("hour_id"))
      .agg(count(lit(1)).as("prev_n"))
      .select(col("h_type"), ((col("hour_id") + 1) * 3600000L).as("h_ms"),
        col("prev_n"))

  /** The enrichment itself — row-local given the broadcast dim, so it
    * composes identically over any batching of the probe side.
    */
  private[graft] def enrichWithPrevHour(ev: DataFrame,
                                        hourly: DataFrame): DataFrame =
    graft.plans.AsOfJoin.broadcast(ev, hourly,
        Seq(("event_type", "h_type")), "ms", "h_ms")
      .select(col("event_id"), col("event_type"), col("ms"), col("h_ms"),
        col("prev_n"))

  /** The SAME enrichment forced through the shuffled-merge exec — the
    * declared A/B control for the broadcast plan: identical answer
    * (same oracle), but the bench's per-query `shuffle_mb` records the
    * full event feed crossing the exchange where the broadcast variant
    * moves only the cell table + output order. The quantitative form of
    * "is this join broadcast-able, and did I broadcast it?".
    */
  def prevHourRateMerge(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.AsOfJoin.merge(
        Tables.events(spark, sfDir)
          .select(col("event_id"), col("event_type"),
            expr("unix_millis(ts)").as("ms")),
        hourlyCells(Tables.events(spark, sfDir)),
        Seq(("event_type", "h_type")), "ms", "h_ms")
      .select(col("event_id"), col("event_type"), col("ms"), col("h_ms"),
        col("prev_n"))
      .orderBy("event_id")

  /** SCD TYPE-2 DIMENSION BUILD — collapse each user's event-type stream
    * into validity-interval versions: a new version opens whenever the
    * tracked attribute (event_type) CHANGES from the previous event, and
    * each version carries [valid_from, valid_to) with the open version
    * flagged current. This is the lakehouse slowly-changing-dimension
    * shape (track attribute history without rewriting facts), built
    * with the gaps-and-islands idiom: change flag by `lag`, version by
    * running sum of flags, interval close by `lead` of the next
    * version's open — three per-user window passes riding ONE user-keyed
    * exchange, linear per user, no self-join (the naive
    * "each row joins its successor" formulation is quadratic on hot
    * keys). Ordering is (ms, event_id) so ties are deterministic; times
    * go out as epoch millis per the timestamp-parity rule.
    */
  def scd2Build(spark: SparkSession, sfDir: String): DataFrame =
    scd2Of(Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type")))

  /** Core of [[scd2Build]] over a (user_id, event_id, ms, event_type)
    * relation — split out so specs can drive handcrafted histories.
    */
  private[graft] def scd2Of(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    ev
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull
          .or(col("prev_type") =!= col("event_type")), 1L).otherwise(0L))
      .withColumn("version", sum("chg").over(w))
      .groupBy("user_id", "version", "event_type")
      .agg(min("ms").as("valid_from_ms"), count(lit(1)).as("n_events"))
      .withColumn("valid_to_ms", lead("valid_from_ms", 1).over(byVersion))
      .select(col("user_id"), col("version").cast("long").as("version"),
        col("event_type"), col("valid_from_ms"), col("valid_to_ms"),
        col("n_events").cast("long").as("n_events"),
        when(col("valid_to_ms").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy("user_id", "version")
  }

  /** USER-JOURNEY TRANSITION MATRIX — the first-order Markov model of
    * the event feed: for every consecutive step in a user's timeline,
    * count (event_type → next event_type) and report each transition's
    * share among the steps leaving the same state. One user_id exchange
    * carries the lead() window (the same exchange sessionize pays); the
    * (from, to) aggregation collapses to a T×T table, so its row-share
    * window is metadata-sized no matter how large the feed is. Ordering
    * parity per the file contract: (epoch ms, event_id), never raw ts.
    * The probability is one division of two exact counts rounded at 6
    * decimals — the identical expression tree both engines evaluate.
    */
  def transitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    val steps = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .where(col("to_type").isNotNull)
    steps
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("from_type")).cast("double"), 6))
      .orderBy("from_type", "to_type")
  }
}
