package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded mergeable KMV state: the k smallest DISTINCT hash values seen.
  * A sorted set because KMV is defined over distinct values — a duplicate
  * hash must not occupy two of the k slots.
  */
final class KmvState(val k: Int) {
  val mins = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last) {
      if (mins.add(h)) { mins.remove(mins.last); () }
    }
  }
  def merge(other: KmvState): Unit = {
    val it = other.mins.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** NATIVE KMV DISTINCT SKETCH — a Catalyst `TypedImperativeAggregate`
  * (the binary-mergeable-state aggregate tier: serialize/merge across
  * partial aggregation, exactly how DataSketches integrates with Spark).
  * Returns struct(k_actual, kth_min): the declarative twin derives the
  * same pair with a per-group `row_number` window — which must SHUFFLE
  * EVERY distinct value to its group's partition before ranking. This
  * aggregate instead runs map-side partial sketches: each task forwards
  * at most k longs per group into the exchange, the canonical
  * input-vs-k reduction that makes sketch pipelines linear at 100 TB.
  * The result is a pure function of the input SET (k smallest distinct
  * hashes — associative, commutative, duplicate-insensitive), so it is
  * oracle-checkable and layout-invariant, unlike HLL++ whose register
  * layout is implementation-specific.
  *
  * SQL surface: `kmv_sketch(h, k)` via [[graft.GraftExtensions]].
  */
case class KmvSketchAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  require(k > 0, "kmv_sketch: k must be positive")

  // declare the long input so a mistyped argument (e.g. an INT hash
  // column) is implicitly cast — or cleanly rejected — AT ANALYSIS,
  // instead of update()'s asInstanceOf[Long] throwing at execution
  override def inputTypes = Seq(LongType)

  override def dataType: DataType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("kth_min", LongType, nullable = true)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KmvState): Any = {
    val out = new GenericInternalRow(2)
    out.setLong(0, buffer.mins.size.toLong)
    if (buffer.mins.isEmpty) out.setNullAt(1)
    else out.setLong(1, buffer.mins.last)
    out
  }

  override def serialize(buffer: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.mins.size)
    bb.putInt(buffer.mins.size)
    val it = buffer.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    var i = 0
    while (i < n) { st.add(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketchAgg {
  /** Column-API face: `kmvSketch(col("h"), 64)` → struct(k, kth_min). */
  def kmvSketch(h: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(h), k).toAggregateExpression())
}

/** KMV MEMBER VARIANT — same bounded mergeable state as [[KmvSketchAgg]]
  * but `eval` returns the sketch MEMBERS (the k smallest distinct hashes,
  * ascending `array<bigint>`) instead of just (k, kth_min). The members
  * are what sketch SET ALGEBRA needs: the union sketch of A and B is the
  * k smallest of K(A) ∪ K(B) (pure array math on two k-sized arrays — no
  * second pass over the data), and the Jaccard estimate is the fraction
  * of union-sketch members present in both K(A) and K(B) — the classic
  * KMV coincidence estimator. Deterministic and duplicate-insensitive
  * like the parent, so oracle-checkable.
  *
  * SQL surface: `kmv_hashes(h, k)` via [[graft.GraftExtensions]].
  */
case class KmvHashesAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  require(k > 0, "kmv_hashes: k must be positive")

  // analysis-time typing, as in KmvSketchAgg
  override def inputTypes = Seq(LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KmvState): Any = {
    val out = new Array[Long](buffer.mins.size)
    val it = buffer.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 } // TreeSet: ascending
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buffer: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.mins.size)
    bb.putInt(buffer.mins.size)
    val it = buffer.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    var i = 0
    while (i < n) { st.add(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvHashesAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_hashes"
}

object KmvHashesAgg {
  /** Column-API face: `kmvHashes(col("h"), 64)` → array<bigint>, the k
    * smallest distinct hashes ascending.
    */
  def kmvHashes(h: Column, k: Int): Column =
    ColumnBridge.column(
      KmvHashesAgg(ColumnBridge.expression(h), k).toAggregateExpression())
}
