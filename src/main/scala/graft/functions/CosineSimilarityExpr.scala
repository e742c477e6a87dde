package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared typing for the native vector kernels: each side independently
  * accepts `array<float>` (corpus embeddings) or `array<double>` (plane /
  * centroid literals); anything else is rejected AT ANALYSIS instead of
  * silently reading garbage through the wrong accessor. Floats are cast
  * to double per element — exact (24-bit mantissas) — so mixing widths
  * never changes a result bit.
  */
private[functions] trait VectorKernel { self: BinaryExpression =>

  protected def isOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected def typeCheck(name: String): TypeCheckResult =
    if (isOk(left.dataType) && isOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  protected def isFloat(dt: DataType): Boolean =
    dt == ArrayType(FloatType, containsNull = false) ||
      dt == ArrayType(FloatType, containsNull = true)

  /** Element read as double, branch resolved once per side at eval. */
  protected def readAt(x: ArrayData, float: Boolean, i: Int): Double =
    if (float) x.getFloat(i).toDouble else x.getDouble(i)

  /** Codegen accessor string — the branch resolves at CODEGEN time from
    * the static child type, so the generated loop is branch-free.
    */
  protected def genRead(v: String, dt: DataType, i: String): String =
    if (isFloat(dt)) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** Native Catalyst expression for cosine similarity over two vector
  * columns — the codegen'd fast path for brute-force similarity search.
  *
  * Semantics are IDENTICAL to [[VectorFunctions.cosine]] (cast each float
  * to double, exact products, sequential left-to-right sums, NULL when a
  * norm is zero — matching Spark's non-ANSI Divide on a 0.0 divisor), so
  * results stay bit-for-bit equal to the DuckDB oracle. The difference is
  * purely mechanical: `zip_with`/`aggregate` allocate an intermediate array
  * and evaluate a lambda per element; this compiles to a tight primitive
  * loop inside WholeStageCodegen with zero allocation — the (b) path of the
  * custom-operator preference order (compose > Expression > Strategy >
  * mapPartitions).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernel {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  // nullable even for non-null children: zero-norm input yields NULL, and
  // so do a NULL ELEMENT and LENGTH-MISMATCHED inputs — the HOF twin's
  // zip_with null-pads the short side and the null product poisons its
  // aggregate sum, and an unguarded getFloat/getDouble on a null slot
  // reads stale UnsafeArrayData bits (silent garbage, not an error). A
  // common-prefix cosine would hand a truncated embedding a REAL
  // similarity — and possibly a top-k rank — the oracle never computes.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = typeCheck(prettyName)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val xf = isFloat(left.dataType)
    val yf = isFloat(right.dataType)
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = readAt(x, xf, i)
      val yi = readAt(y, yf, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // every local through ctx.freshName: two instances of this expression
      // can land in ONE whole-stage-codegen scope, where fixed names would
      // collide (Janino "Redefinition of local variable") and silently
      // demote the whole stage to interpreted mode
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $x.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |boolean $bad = $n != $y.numElements();
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |  double $xi = ${genRead(x, left.dataType, i)};
         |  double $yi = ${genRead(y, right.dataType, i)};
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($bad || $denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native dot product with the same typing, arithmetic order, and
  * codegen shape as [[CosineSimilarity]] — bit-identical to
  * [[VectorFunctions.dot]] (exact per-element double products, sequential
  * sum). Replaces the interpreted zip_with∘aggregate in per-row inner
  * loops (LSH plane projections score NumTables×BitsPerTable dots per
  * corpus row).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernel {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // nullable beyond null children: LENGTH-MISMATCHED inputs yield NULL,
  // exactly like the HOF form (zip_with null-pads the short side, the
  // null product poisons the sequential sum) — a common-prefix dot would
  // silently assign a malformed row a REAL sign/bucket the oracle's
  // per-row arithmetic never computes. A NULL ELEMENT yields NULL for
  // the same reason: the HOF's null product poisons its sum, and an
  // unguarded getFloat/getDouble on a null slot reads stale bits.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = typeCheck(prettyName)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val xf = isFloat(left.dataType)
    val yf = isFloat(right.dataType)
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += readAt(x, xf, i) * readAt(y, yf, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    $dot += ${genRead(x, left.dataType, i)} * ${genRead(y, right.dataType, i)};
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  /** Column API for the native expression (Spark 4 classic backend). */
  def cosineNative(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for the native dot product. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
