package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.PlanBridge
import org.apache.spark.sql.types.LongType

/** NATIVE AS-OF JOIN — the (c) rung of the custom-operator ladder that
  * the survey reserves for semantics Spark's relational algebra cannot
  * express efficiently: a whole logical operator with its own physical
  * execution, registered through the planner.
  *
  * Semantics: for every left row, attach the right row with the greatest
  * `rightTime <= leftTime` among rows sharing the join key (backward
  * as-of; no match → null-padded right side). The declarative
  * formulations all have a flaw the custom operator removes:
  *   - `left JOIN right ON key AND rt <= lt` + max-per-left generates
  *     L×R intermediate rows per key before aggregating (quadratic on a
  *     hot key);
  *   - the union+window trick ([[graft.operators.Events.asofPurchaseView]])
  *     is linear but forces both sides through ONE schema and carries
  *     payloads as nulls through the window buffer;
  *   - time-bin bucketing bounds candidates but fixes a bin width.
  * The physical operator instead asks the planner for hash
  * co-partitioning on the key and (key, time) sort order WITHIN each
  * partition — the exact distribution+ordering contract SortMergeJoin
  * uses — and then streams BOTH sorted sides through a single forward
  * merge holding ONE buffered right row. Per partition the cost is
  * |L| + |R| rows and O(1) memory: no per-key group materialization, no
  * window buffer, no candidate blow-up, at any key skew.
  */
/** `broadcastRight`: Some(true) forces the broadcast exec, Some(false)
  * forces the shuffled merge, None (the default) lets the planner choose
  * from right-side statistics — the same contract as Spark's own join
  * hints vs. `JoinSelection`'s size-based pick.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    broadcastRight: Option[Boolean] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: the logical as-of node has two physical
  * implementations — the shuffled merge, and the broadcast lookup that
  * leaves the big side in place. Selection mirrors `JoinSelection`: an
  * explicit hint wins; otherwise the right side broadcasts iff its
  * estimated size clears `spark.sql.autoBroadcastJoinThreshold` (so
  * `-1` disables auto-broadcast exactly as for equi-joins). Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]) or `spark.experimental.extraStrategies`
  * ([[AsOfJoin.ensureRegistered]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, hint) =>
      val bcast = hint.getOrElse {
        val threshold =
          org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        threshold > 0 && r.stats.sizeInBytes <= threshold
      }
      if (bcast)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** The SortMergeJoin contract: co-partition both children on the key
    * (EnsureRequirements aligns the two hash partitionings) and sort each
    * partition by (key, time). Everything the merge needs is then local.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val lTime = BindReferences.bindReference(lTimeExpr, leftOutput)
      val rTime = BindReferences.bindReference(rTimeExpr, rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.size)
      // bind against NULLABLE right attributes: the no-match null-padded
      // row must survive the projection (a non-nullable binding would
      // skip the null check and read field defaults)
      val outProj = UnsafeProjection.create(allOutput,
        leftOutput ++ rightOutput.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // one-row lookahead into the right side (copied out of the
        // iterator's reused row) + the current best match for the key
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rMs: Long = 0L
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        // SQL semantics: NULL never matches. A NULL key or NULL time on
        // the right can match no left row — skip such rows here (they
        // sort FIRST under the ascending nulls-first child ordering, so
        // skipping preserves the forward merge). Without the eval-null
        // check, `eval(...).asInstanceOf[Long]` would unbox null to 0L
        // and silently treat a null timestamp as the epoch.
        private def advanceRight(): Unit = {
          var ok = false
          while (!ok && rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rKeyProj(rRow).copy()
            val t = rTime.eval(rRow)
            if (t != null && !rKey.anyNull) { rMs = t.asInstanceOf[Long]; ok = true }
          }
          if (!ok) rRow = null
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt0 = lTime.eval(l)
          // NULL left key or time: no right row matches — null-pad
          // without touching the merge state (null-keyed left rows sort
          // first, before any buffered match exists)
          if (lt0 == null || lk.anyNull) return outProj(joined(l, nullRight))
          val lMs = lt0.asInstanceOf[Long]
          if (matchRow != null && keyOrd.compare(matchKey, lk) != 0) {
            matchRow = null; matchKey = null
          }
          var scanning = true
          while (scanning && rRow != null) {
            val c = keyOrd.compare(rKey, lk)
            if (c < 0) advanceRight()
            else if (c == 0 && rMs <= lMs) {
              matchRow = rRow; matchKey = rKey; advanceRight()
            } else scanning = false
          }
          if (matchRow != null) outProj(joined(l, matchRow))
          else outProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** BROADCAST AS-OF JOIN — the dimension-table case the shuffled merge
  * over-pays for. [[AsOfJoinExec]] asks the planner to hash-co-partition
  * AND sort BOTH sides; when the right side is broadcast-sized (a rate
  * card, a config history, an hourly cell table) that contract forces a
  * full shuffle + sort of the 100 TB fact side to join against kilobytes.
  * This exec instead asks for a plain `BroadcastDistribution` on the
  * right — the planner inserts one `BroadcastExchange`, and the left side
  * keeps its partitioning AND its ordering (no exchange, no sort, stays
  * inside the scan pipeline). Each task builds a key → time-sorted-rows
  * index from the broadcast once (dimension-sized by contract) and
  * binary-searches the greatest `rightTime <= leftTime` per probe row:
  * O(|L| · log |R_key|) with zero data movement of the fact side — the
  * same trade `BroadcastHashJoin` makes against `SortMergeJoin`.
  *
  * NULL semantics match [[AsOfJoinExec]]: NULL keys/times never match.
  * Tie-break on equal right times matches up to the inherent
  * nondeterminism of duplicate (key, time) right rows: both execs take
  * the LAST row at the matched time (upper-bound search here,
  * last-buffered in the merge), but "last" among rows whose sort keys
  * are fully equal is whatever order the engine happened to produce, so
  * payload columns of tied duplicates may differ between the two paths.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression)
  extends SparkPlan with BinaryExecNode {

  // driver-minted identity for this exec instance; combined with the
  // broadcast id it keys the per-executor index cache (two different
  // as-of joins over the same broadcast must not share an index, since
  // their key/time expressions differ)
  private val buildInstanceId: String = java.util.UUID.randomUUID().toString

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil
  // the probe side flows through untouched — advertise its partitioning
  // and ordering so downstream operators (a final sort, an aggregation
  // on the same key) can keep reusing them
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    // the built index is identical for every task of this exec on an
    // executor — memoize it per (exec instance, broadcast) the way
    // BroadcastHashJoin reuses its built relation, so a wide fact scan
    // with hundreds of partitions pays the O(|R| log |R|) build once per
    // executor instead of once per task
    val cacheKey = s"$buildInstanceId#${bc.id}"
    left.execute().mapPartitions({ lIter =>
      val index = BroadcastAsOfJoinExec.cachedIndex(cacheKey, {
        // key → times sorted asc, parallel row array. Dimension-sized by
        // the broadcast contract; rows are shared with the executor's
        // cached broadcast value, keys are compact UnsafeRow copies.
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
        val rTime = BindReferences.bindReference(rTimeExpr, rightOutput)
        val grouped = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        bc.value.foreach { row =>
          val t = rTime.eval(row)
          val k = rKeyProj(row)
          // NULL right key/time matches nothing — exclude from the index
          if (t != null && !k.anyNull) {
            var buf = grouped.get(k)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]
              grouped.put(k.copy(), buf)
            }
            buf += ((t.asInstanceOf[Long], row))
          }
        }
        val built = new java.util.HashMap[UnsafeRow,
          (Array[Long], Array[InternalRow])](grouped.size() * 2)
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1) // stable: equal times keep order
          built.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        built
      })
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val lTime = BindReferences.bindReference(lTimeExpr, leftOutput)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.size)
      val outProj = UnsafeProjection.create(allOutput,
        leftOutput ++ rightOutput.map(_.withNullability(true)))
      lIter.map { l =>
        val lt0 = lTime.eval(l)
        val lk = lKeyProj(l)
        var m: InternalRow = null
        if (lt0 != null && !lk.anyNull) {
          val entry = index.get(lk)
          if (entry != null) {
            val lMs = lt0.asInstanceOf[Long]
            val times = entry._1
            // upper-bound binary search: LAST index with time <= lMs
            var lo = 0; var hi = times.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= lMs) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) m = entry._2(ans)
          }
        }
        if (m != null) outProj(joined(l, m))
        else outProj(joined(l, nullRight))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  private type Index =
    java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])]
  // executor-wide memo of built broadcast indexes, soft-valued so the JVM
  // reclaims them under memory pressure (the underlying rows live in the
  // block manager's broadcast cache either way — this only holds the
  // key/offset structure built on top of them)
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[Index]]()

  private[plans] def cachedIndex(key: String, build: => Index): Index = {
    val ref = cache.get(key)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else cache.synchronized {
      // re-check under the lock: the first task builds, the rest reuse
      val ref2 = cache.get(key)
      val hit2 = if (ref2 == null) null else ref2.get()
      if (hit2 != null) hit2
      else {
        val built = build
        cache.put(key, new java.lang.ref.SoftReference(built))
        built
      }
    }
  }
}

/** Public face: `AsOfJoin(left, right, keys, leftTime, rightTime)`.
  * Column names of the two sides must be disjoint (rename before the
  * call — same contract as `join` with duplicate-name outputs, minus the
  * ambiguity trap). Time columns must be LongType (epoch ms); keys any
  * orderable type. NULL semantics follow SQL equality: a NULL key or
  * NULL time on either side never matches — such left rows emit
  * null-padded output, such right rows match nothing (same as DuckDB
  * ASOF).
  */
object AsOfJoin {
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = PlanBridge.experimental(spark)
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** Planner-chosen execution (the default): broadcast iff the right
    * side's estimated size clears the auto-broadcast threshold.
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
            leftTime: String, rightTime: String): DataFrame =
    build(left, right, keys, leftTime, rightTime, broadcastRight = None)

  /** The `functions.broadcast` idiom for the as-of join: same semantics
    * as [[apply]], executed by [[BroadcastAsOfJoinExec]] — the right side
    * broadcasts, the left side is neither shuffled nor sorted. Use when
    * the right side is dimension-sized (the caller's assertion, exactly
    * as with `broadcast()` on an equi-join).
    */
  def broadcast(left: DataFrame, right: DataFrame,
                keys: Seq[(String, String)],
                leftTime: String, rightTime: String): DataFrame =
    build(left, right, keys, leftTime, rightTime, broadcastRight = Some(true))

  /** Force the shuffled merge even for a statistics-small right side —
    * the SHUFFLE_HASH-style counter-hint (and the way to pin the merge
    * exec under test at small scale).
    */
  def merge(left: DataFrame, right: DataFrame,
            keys: Seq[(String, String)],
            leftTime: String, rightTime: String): DataFrame =
    build(left, right, keys, leftTime, rightTime, broadcastRight = Some(false))

  private def build(left: DataFrame, right: DataFrame,
                    keys: Seq[(String, String)], leftTime: String,
                    rightTime: String,
                    broadcastRight: Option[Boolean]): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asof: no column '$n' in ${p.output.map(_.name).mkString(", ")}"))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      "asof time columns must be LongType epoch values")
    PlanBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      lt, rt, broadcastRight))
  }
}
