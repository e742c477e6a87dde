package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` columns using Spark's
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no UDFs.
  *
  * FP-determinism contract (verified bit-exact against DuckDB): every
  * float is cast to double BEFORE multiplying, so each product is exact
  * (24-bit × 24-bit mantissas fit in a double), and sums run sequentially
  * left-to-right — the same order DuckDB's `list_sum` uses. Results are
  * therefore bitwise identical across engines, and `round(_, 6)` in query
  * outputs is pure safety margin.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (exact). */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-to-right sum of an array<double>. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float vectors, computed in double. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
