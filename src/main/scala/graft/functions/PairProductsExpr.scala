package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the covariance pair-product stage: all
  * upper-triangle products of an `array<long>` with itself, as ONE dense
  * `array<long>` of length d(d+1)/2 in row-major order — position k holds
  * q[i]·q[j] with k = i·(2d−i+1)/2 + (j−i), j ≥ i. The POSITION is the
  * pair identity (`posexplode` recovers it for free), so no struct is
  * built at all: where the HOF form
  * (`flatten(transform(seq, i -> transform(seq, j -> struct(...))))`)
  * allocates a struct per pair and evaluates two interpreted lambdas per
  * element — Spark does not codegen higher-order functions — this
  * compiles to a tight primitive loop writing a `long[]` wrapped as
  * UnsafeArrayData: zero boxing, zero lambda dispatch.
  *
  * Null semantics mirror the HOF form: a NULL array yields NULL; a NULL
  * ELEMENT yields NULL products in every pair it touches (rare path —
  * detected by one pre-scan, then boxed). Products are Java long
  * arithmetic: micro-unit quantized embeddings (|q| ≤ ~10⁸ for any
  * real-world component) keep products below 2⁶³ by many orders of
  * magnitude, so wrap-around is unreachable where the operator is
  * defined.
  */
case class PairProducts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "pair_products"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val d = x.numElements()
    // d(d+1)/2 in LONG: at d ≈ 65536 the Int product wraps negative and
    // a wrong (not just failed) allocation follows. JVM arrays cap the
    // triangle at Int.MaxValue anyway, so past that we fail FAST and
    // loud rather than let the wrap corrupt the covariance silently.
    val tL = d.toLong * (d + 1L) / 2L
    if (tL > Int.MaxValue)
      throw new IllegalArgumentException(
        s"$prettyName: triangle size d(d+1)/2 = $tL for d = $d exceeds " +
          "the JVM array limit; split the vector into subspaces")
    val t = tL.toInt
    var hasNull = false
    var i = 0
    while (i < d && !hasNull) { hasNull = x.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](t)
      var k = 0
      i = 0
      while (i < d) {
        val qi = x.getLong(i)
        var j = i
        while (j < d) { out(k) = qi * x.getLong(j); k += 1; j += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](t)
      var k = 0
      i = 0
      while (i < d) {
        val ni = x.isNullAt(i)
        val qi = if (ni) 0L else x.getLong(i)
        var j = i
        while (j < d) {
          out(k) = if (ni || x.isNullAt(j)) null else qi * x.getLong(j)
          k += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // freshName everything: two instances can share one codegen scope
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val hasNull = ctx.freshName("hasNull")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val qi = ctx.freshName("qi")
      val ni = ctx.freshName("ni")
      val outP = ctx.freshName("outP")
      val outB = ctx.freshName("outB")
      val tL = ctx.freshName("tL")
      s"""
         |int $d = $x.numElements();
         |long $tL = (long) $d * ($d + 1L) / 2L;
         |if ($tL > Integer.MAX_VALUE) {
         |  throw new IllegalArgumentException(
         |    "pair_products: triangle size d(d+1)/2 = " + $tL + " for d = "
         |      + $d + " exceeds the JVM array limit; split the vector");
         |}
         |int $t = (int) $tL;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $d && !$hasNull; $i++) {
         |  $hasNull = $x.isNullAt($i);
         |}
         |if (!$hasNull) {
         |  long[] $outP = new long[$t];
         |  int $k = 0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    long $qi = $x.getLong($i);
         |    for (int $j = $i; $j < $d; $j++) {
         |      $outP[$k++] = $qi * $x.getLong($j);
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($outP);
         |} else {
         |  Object[] $outB = new Object[$t];
         |  int $k = 0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    boolean $ni = $x.isNullAt($i);
         |    long $qi = $ni ? 0L : $x.getLong($i);
         |    for (int $j = $i; $j < $d; $j++) {
         |      if ($ni || $x.isNullAt($j)) { $outB[$k++] = null; }
         |      else { $outB[$k++] = java.lang.Long.valueOf($qi * $x.getLong($j)); }
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($outB);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PairProducts =
    copy(child = newChild)
}

object PairProductsExpr {
  /** Column API for the native expression. */
  def pairProducts(q: Column): Column =
    ColumnBridge.column(PairProducts(ColumnBridge.expression(q)))
}
