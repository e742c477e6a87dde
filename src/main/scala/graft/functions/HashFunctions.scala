package graft.functions

import org.apache.spark.sql.Column

/** Deterministic multiplicative hashing shared by the sampling / privacy /
  * split / sketch operators. The product runs in DECIMAL(38,0) so ANY
  * 64-bit id hashes exactly: a long accumulator would overflow at
  * id ≳ 3.4e9 — where Spark silently wraps but DuckDB's checked BIGINT
  * arithmetic errors, so the engine and the oracle would diverge exactly
  * when ids reach 100 TB-corpus sizes. The oracle side mirrors with
  * HUGEINT (128-bit) arithmetic.
  */
object HashFunctions {

  val Knuth = 2654435761L // Knuth's multiplicative constant (golden ratio)

  /** (id · Knuth) mod `m`, exact for any 64-bit id. */
  def knuthMod(id: Column, m: Long): Column =
    ((id.cast("decimal(38,0)") * Knuth) % m).cast("long")
}
