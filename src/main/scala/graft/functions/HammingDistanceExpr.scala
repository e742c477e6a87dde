package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for Hamming distance between two sign-bit
  * word arrays (`array<bigint>` of packed 64-bit words): Σ popcount(aᵢ
  * xor bᵢ) over the common prefix — the ranking kernel of the
  * binary-quantized similarity tier, where every (query, corpus) pair
  * pays one evaluation.
  *
  * Semantics are IDENTICAL to the HOF form
  * (`aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y)), 0, +)`):
  * integer xor/popcount sums are exact, so swapping the implementations
  * cannot change a single output bit — the difference is purely
  * mechanical (interpreted lambda dispatch + an intermediate array per
  * pair vs a codegen'd two-instruction loop, the same trade as
  * [[CosineSimilarity]]). Pinned against the HOF form in
  * HammingDistanceExprSpec.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // nullable beyond null children: a NULL ELEMENT yields NULL — the HOF
  // fold's bit_count(null) poisons its sum the same way, and an
  // unguarded getLong on a null slot reads stale UnsafeArrayData bits
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName everything: two instances can share one codegen scope
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |  $acc += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistanceExpr {
  /** Column API for the native expression. */
  def hammingNative(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
