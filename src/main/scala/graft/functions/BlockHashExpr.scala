package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native 63-bit BLOCKHASH over a binary payload — the perceptual hash
  * behind image near-dup detection ([[graft.operators.Multimodal]]).
  *
  * Definition (exact integer arithmetic end to end, so the DuckDB
  * oracle replays it from the payload bytes): byte i (unsigned) joins
  * block j = i mod 63; bit j is set iff 63·blocksum_j > totalsum —
  * "this block is brighter than the mean block", the blockhash.io
  * construction with the mean test cleared of its division. 63 bits,
  * not 64, keeps the packed signature strictly positive in a signed
  * Long — DuckDB raises on `1::BIGINT << 63`, and a sign bit would cost
  * every consumer an unsigned-compare dance for zero recall gain.
  *
  * Why a native Expression (rung (b), after CosineSimilarity/PolyHash/
  * PolyFold64): Spark has no HOF over BinaryType, and the
  * `transform(sequence(1, length(text)), i -> ascii(substring(...)))`
  * workaround is O(n²) per document (UTF8String.substring is an O(i)
  * scan). This is one O(n) primitive loop with a fixed 63-long
  * accumulator, whole-stage-codegen'd, so hashing is scan-bound — at
  * 100 TB of assets the hash runs once per payload byte.
  */
case class BlockHash63(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "block_hash63"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val acc = new Array[Long](63)
    var total = 0L
    var i = 0
    while (i < bytes.length) {
      val b = (bytes(i) & 0xff).toLong
      acc(i % 63) += b
      total += b
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 63) {
      if (acc(j) * 63 > total) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // freshName EVERY local — two instances in one whole-stage-codegen
      // scope must not collide (the CosineSimilarity lesson)
      val acc = ctx.freshName("acc")
      val total = ctx.freshName("total")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $acc = new long[63];
         |long $total = 0L;
         |for (int $i = 0; $i < $s.length; $i++) {
         |  long $b = (long) ($s[$i] & 0xff);
         |  $acc[$i % 63] += $b;
         |  $total += $b;
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 63; $j++) {
         |  if ($acc[$j] * 63L > $total) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BlockHash63 =
    copy(child = newChild)
}

object BlockHashExpr {
  /** Column API for the native expression (Spark 4 classic backend). */
  def blockHash63(payload: Column): Column =
    ColumnBridge.column(BlockHash63(ColumnBridge.expression(payload)))
}
