package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial string hash `fold(acc·31 + byte) mod 1e9+7` over the
  * UTF-8 bytes — the codegen'd fast path for the fingerprint/checksum
  * family, second instance of the (b) custom-Expression rung after
  * [[CosineSimilarity]]. The `aggregate(sequence(1, length(s)), …)` HOF
  * form allocates the index array and evaluates a lambda per character;
  * this is a tight primitive loop with zero allocation.
  *
  * For pure-ASCII input (every graft term is `[a-z]+`) the byte fold is
  * IDENTICAL to the HOF form's `ascii(substr(s, i, 1))` code-point fold
  * and to DuckDB's `ord(s[i])` — the engine-exactness contract the
  * checksum oracles rely on. Outside ASCII the byte-wise definition is
  * still deterministic, just no longer the code-point fold.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // freshName EVERY local — two instances in one whole-stage-codegen
      // scope must not collide (the CosineSimilarity lesson)
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHashExpr {
  /** Column API for the native expression (Spark 4 classic backend). */
  def polyHash(s: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(s)))
}
