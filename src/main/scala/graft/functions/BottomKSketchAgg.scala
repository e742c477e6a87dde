package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded mergeable bottom-k sample state: the k smallest DISTINCT
  * (hash, value) pairs seen, ordered lexicographically. Pair-distinctness
  * (not hash-distinctness) keeps the state a pure function of the input
  * SET — two rows that collide on the hash but carry different values
  * both stay sampleable, and the tie is broken by the value itself, so
  * the result is deterministic under any partitioning or merge order.
  */
final class BottomKState(val k: Int) {
  val mins = new java.util.TreeSet[(Long, Double)](
    new java.util.Comparator[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Double.compare(a._2, b._2)
      }
    })
  def add(h: Long, v: Double): Unit = {
    val p = (h, v)
    if (mins.size < k) { mins.add(p); () }
    else if (mins.comparator.compare(p, mins.last) < 0) {
      if (mins.add(p)) { mins.remove(mins.last); () }
    }
  }
  def merge(other: BottomKState): Unit = {
    val it = other.mins.iterator()
    while (it.hasNext) { val p = it.next(); add(p._1, p._2) }
  }
  /** Sample values, sorted ascending — the order quantile extraction
    * indexes into.
    */
  def sortedValues: Array[Double] = {
    val out = new Array[Double](mins.size)
    val it = mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

/** NATIVE BOTTOM-K SAMPLE SKETCH — a Catalyst `TypedImperativeAggregate`
  * that keeps the k smallest distinct (hash, value) pairs and returns the
  * sampled values sorted ascending (`array<double>`). With a uniform
  * per-row hash this IS a uniform fixed-size sample of the group — the
  * mergeable, deterministic building block for quantile estimation and
  * range-partition boundary planning at 100 TB:
  *
  *  - MERGEABLE: bottom-k of a union = bottom-k of the two bottom-k's,
  *    so partial aggregation works map-side and each task forwards at
  *    most k pairs per group into the exchange — the input-vs-k
  *    reduction that makes the sketch linear where a per-group
  *    `row_number` window must shuffle EVERY row to its group's
  *    partition before ranking.
  *  - DETERMINISTIC: the result is a pure function of the input set
  *    (k lexicographically-smallest distinct pairs — associative,
  *    commutative, duplicate-insensitive), so it is layout-invariant
  *    and oracle-checkable, unlike `percentile_approx` whose
  *    KLL/GK-style compaction depends on arrival order.
  *
  * This is the same machinery Spark itself uses to plan a global sort
  * (`RangePartitioner` samples each partition, merges, and cuts
  * boundaries) — exposed here as a first-class relational operator.
  *
  * SQL surface: `bottomk_sketch(h, v, k)` via [[graft.GraftExtensions]].
  */
case class BottomKSketchAgg(
    left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKState] with BinaryLike[Expression]
  with ImplicitCastInputTypes {

  require(k > 0, "bottomk_sketch: k must be positive")

  // analysis-time typing: mistyped args implicitly cast or cleanly fail
  // instead of update()'s asInstanceOf throwing at execution
  override def inputTypes = Seq(LongType, DoubleType)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKState = new BottomKState(k)

  override def update(buffer: BottomKState, input: InternalRow): BottomKState = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      buffer.add(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: BottomKState, other: BottomKState): BottomKState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: BottomKState): Any =
    new GenericArrayData(buffer.sortedValues)

  override def serialize(buffer: BottomKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.mins.size)
    bb.putInt(buffer.mins.size)
    val it = buffer.mins.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putDouble(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new BottomKState(k)
    var i = 0
    while (i < n) { st.add(bb.getLong, bb.getDouble); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSketchAgg =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bottomk_sketch"
}

object BottomKSketchAgg {
  /** Column-API face: `bottomkSketch(col("h"), col("v"), 256)` →
    * array<double> of sampled values, sorted ascending.
    */
  def bottomkSketch(h: Column, v: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSketchAgg(ColumnBridge.expression(h),
        ColumnBridge.expression(v), k).toAggregateExpression())
}
