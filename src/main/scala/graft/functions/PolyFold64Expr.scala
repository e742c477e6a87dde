package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native two-modulus polynomial fold — the codegen'd fast path behind
  * [[HashFunctions.polyFold64]], third instance of the (b)
  * custom-Expression rung after [[CosineSimilarity]] and [[PolyHash]].
  * The HOF form (`aggregate(transform(sequence(...)))`) allocates an
  * index array and evaluates two lambdas per character; this is one
  * tight primitive loop with zero allocation, feeding every sketch
  * operator's hot path (SimHash, KMV, CMS, Bloom) — at 100 TB the fold
  * runs once per term occurrence, so per-char allocation is the
  * difference between a scan-bound and an alloc-bound stage.
  *
  * Arithmetic is EXACTLY the HOF form's: h1 = fold(acc·131 + c) mod
  * 2^31−1, h2 = fold(acc·257 + c) mod 4294967291, result = h1·2^32 + h2.
  * For pure-ASCII input (every graft term is `[a-z]+`) the byte fold
  * equals the code-point fold and DuckDB's `ord(...)` replay — the
  * engine-exactness contract the sketch oracles rely on. Outside ASCII
  * the byte-wise definition is still deterministic, just no longer the
  * code-point fold. PolyFold64ExprSpec pins native ≡ HOF ≡ driver-side
  * literal on the real vocabulary.
  */
case class PolyFold64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fold64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      h1 = (h1 * 131 + c) % 2147483647L
      h2 = (h2 * 257 + c) % 4294967291L
      i += 1
    }
    h1 * 4294967296L + h2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // freshName EVERY local — two instances in one whole-stage-codegen
      // scope must not collide (the CosineSimilarity lesson)
      val bytes = ctx.freshName("bytes")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h1 = 0L;
         |long $h2 = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  int $c = $bytes[$i] & 0xff;
         |  $h1 = ($h1 * 131 + $c) % 2147483647L;
         |  $h2 = ($h2 * 257 + $c) % 4294967291L;
         |}
         |${ev.value} = $h1 * 4294967296L + $h2;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFold64 =
    copy(child = newChild)
}

object PolyFold64Expr {
  /** Column API for the native expression (Spark 4 classic backend). */
  def polyFold64(s: Column): Column =
    ColumnBridge.column(PolyFold64(ColumnBridge.expression(s)))
}
