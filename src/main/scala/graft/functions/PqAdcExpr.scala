package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native asymmetric-distance (ADC) kernel for PQ serving: given a
  * full-precision query (`array<float>`), a corpus vector's codes
  * (`array<int>`, one per subspace) and the codebooks
  * (`array<array<array<double>>>`, a fixed literal), returns
  * Σ_m ‖q_sub(m) − codebook[m][codes[m]]‖².
  *
  * Arithmetic EXACTLY mirrors the HOF form it replaces (pinned in
  * PqAdcExprSpec): per subspace an inner sequential sum of squared
  * (double(q) − c) differences, then the subspace sums accumulate in
  * subspace order — TWO accumulation levels, matching both the old
  * `aggregate(zip_with(slice(...)))` nesting and the oracle's
  * `list_sum(list(pd ORDER BY m))`. A flattened single accumulator would
  * round differently. This evaluates once per (query, corpus) pair — the
  * whole ranking cost of the PQ tier — so interpreted lambda dispatch
  * plus a slice allocation per subspace was the dominant serve cost.
  */
case class PqAdcDistance(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_distance"

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val cOk = second.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val bOk = third.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    if (qOk && cOk && bOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<int>, " +
        s"array<array<array<double>>>), got ${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
  }

  // nullable beyond null children: malformed inputs (null code slot,
  // code id outside the codebook, query shorter than the subspaces
  // cover) yield NULL — exactly what the HOF twin produced through
  // null-padded zip_with / out-of-range element_at, and the only safe
  // answer: an unguarded read would return silent garbage under
  // UnsafeArrayData (runtime bounds asserts are disabled)
  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, codes: Any, books: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = codes.asInstanceOf[ArrayData]
    val ba = books.asInstanceOf[ArrayData]
    val m = math.min(ca.numElements(), ba.numElements())
    val qn = qa.numElements()
    var acc = 0.0
    var s = 0
    var qOff = 0
    while (s < m) {
      // same per-slot null discipline as the query/codebook element reads
      // below: every ArrayData access is isNullAt-guarded, because an
      // unguarded accessor on a null slot reads stale bits, not an error
      if (ca.isNullAt(s) || ba.isNullAt(s)) return null
      val c = ca.getInt(s)
      val book = ba.getArray(s)
      if (c < 0 || c >= book.numElements() || book.isNullAt(c)) return null
      val code = book.getArray(c)
      val sub = code.numElements()
      if (qOff + sub > qn) return null
      var inner = 0.0
      var i = 0
      while (i < sub) {
        if (qa.isNullAt(qOff + i) || code.isNullAt(i)) return null
        val d = qa.getFloat(qOff + i).toDouble - code.getDouble(i)
        inner += d * d
        i += 1
      }
      acc += inner
      qOff += sub
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, codes, books) => {
      val m = ctx.freshName("m")
      val qn = ctx.freshName("qn")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val qOff = ctx.freshName("qOff")
      val c = ctx.freshName("c")
      val book = ctx.freshName("book")
      val code = ctx.freshName("code")
      val sub = ctx.freshName("sub")
      val inner = ctx.freshName("inner")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = java.lang.Math.min($codes.numElements(), $books.numElements());
         |int $qn = $q.numElements();
         |double $acc = 0.0;
         |int $qOff = 0;
         |boolean $bad = false;
         |for (int $s = 0; $s < $m && !$bad; $s++) {
         |  if ($codes.isNullAt($s) || $books.isNullAt($s)) { $bad = true; break; }
         |  int $c = $codes.getInt($s);
         |  org.apache.spark.sql.catalyst.util.ArrayData $book = $books.getArray($s);
         |  if ($c < 0 || $c >= $book.numElements() || $book.isNullAt($c)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $code = $book.getArray($c);
         |  int $sub = $code.numElements();
         |  if ($qOff + $sub > $qn) { $bad = true; break; }
         |  double $inner = 0.0;
         |  for (int $i = 0; $i < $sub; $i++) {
         |    if ($q.isNullAt($qOff + $i) || $code.isNullAt($i)) { $bad = true; break; }
         |    double $d = (double) $q.getFloat($qOff + $i) - $code.getDouble($i);
         |    $inner += $d * $d;
         |  }
         |  $acc += $inner;
         |  $qOff += $sub;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcDistance =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcExpr {
  /** Column API: ADC distance of `q` to the vector encoded by `codes`
    * against the (literal) codebooks.
    */
  def pqAdcNative(q: Column, codes: Column, books: Column): Column =
    ColumnBridge.column(PqAdcDistance(ColumnBridge.expression(q),
      ColumnBridge.expression(codes), ColumnBridge.expression(books)))
}
