package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** 62-bit golden-ratio multiplier (⌊2^62/φ⌋ forced odd) for hashes that
    * need a 62-BIT OUTPUT DOMAIN (e.g. the KMV join-size sketch): the
    * 32-bit constant mod 2^62 leaves small ids UNWRAPPED (order-preserving,
    * not uniform — a KMV estimator over it is off by 10^5×, measured),
    * while this one wraps every id ≥ 2. Odd ⇒ bijection mod 2^62, so key
    * distinctness is preserved across the whole 62-bit range. Max product
    * 2^63·K62 ≈ 2.6e37 < 10^38−1, so the decimal(38,0) path stays exact
    * for ALL 64-bit ids (the oracle mirrors in HUGEINT).
    */
  val Knuth62 = 2850178704830799361L

  /** (id · Knuth62) mod 2^62 — exact for any 64-bit id, and uniform on
    * [0, 2^62) for NONNEGATIVE ids. Negative ids keep the decimal `%`'s
    * sign-of-dividend semantics (exact, spec-pinned), which means their
    * hashes are NEGATIVE: arithmetic parity holds, but a KMV minimum
    * sketch over negative keys would be dominated by them and its
    * Û = (k−1)·2^62/max(K) estimate biased — route such keys through a
    * nonnegative pre-map first (the join-size estimator's TPC-H keys are
    * nonnegative by schema).
    *
    * Fast path (nonnegative ids): the 62×62-bit product is SPLIT so no
    * intermediate exceeds Long range under Spark 4's ANSI overflow
    * checks — with a = id mod 2^62 = a1·2^31 + a0 and K = k1·2^31 + k0
    * (each half < 2^31),
    *   (a·K) mod 2^62 = (((a1·k0 + a0·k1) mod 2^31)·2^31 + a0·k0) mod 2^62
    * — the cross term peaks at 2·(2^31−1)² ≈ 9.223e18, just inside
    * Long.MaxValue, and everything else stays below 2^63: six codegen'd
    * integer ops per row instead of a decimal(38,0) multiply/modulo
    * (measured 2× on the join-size estimator's key scan). Negative ids
    * fall back to the exact decimal form, the [[knuthMod]] discipline;
    * equivalence across the id range is pinned in HashFunctionsSpec.
    */
  def knuth62Mod(id: Column): Column = {
    val m62mask = 4611686018427387903L // 2^62 − 1
    val general =
      ((id.cast("decimal(38,0)") * Knuth62) % 4611686018427387904L).cast("long")
    val k1 = Knuth62 >>> 31
    val k0 = Knuth62 & 2147483647L
    val a = id.bitwiseAND(lit(m62mask))
    val a1 = shiftright(a, 31)           // < 2^31
    val a0 = a.bitwiseAND(lit(2147483647L))
    val cross = (a1 * k0 + a0 * k1).bitwiseAND(lit(2147483647L)) // mod 2^31
    val fast = (shiftleft(cross, 31) + a0 * k0).bitwiseAND(lit(m62mask))
    when(id >= 0, fast).otherwise(general)
  }

  /** (id · Knuth) mod `m`, exact for any 64-bit id.
    *
    * For the power-of-two modulus every sampling/privacy call site uses
    * (m = 2^32) the decimal detour is unnecessary — but the naive long
    * fast path `(id·K) & 0xFFFFFFFF` is a trap under Spark 4's default
    * ANSI mode: the wrap the mask relies on THROWS as overflow at
    * id ≥ ⌈2^63/K⌉ ≈ 3.5e9, i.e. exactly at 100 TB-corpus id ranges
    * while every small-SF test stays green. Instead the product is
    * SPLIT so no intermediate exceeds 2^48:
    * with a = id mod 2^32 = a1·2^16 + a0,
    * (a·K) mod 2^32 = (((a1·K) mod 2^16)·2^16 + a0·K) mod 2^32
    * — four codegen'd integer ops per row instead of a decimal(38,0)
    * multiply/modulo. The masked result is nonnegative, matching the
    * sign-of-dividend semantics of the decimal path (and the oracle's
    * HUGEINT `%`) for nonnegative ids; a NEGATIVE id would diverge, so
    * the fast path guards per row and falls back to the exact decimal
    * form. Equivalence across the id range (small, > 2^32, near
    * Long.MaxValue) is pinned in HashFunctionsSpec.
    */
  def knuthMod(id: Column, m: Long): Column = {
    val general = ((id.cast("decimal(38,0)") * Knuth) % m).cast("long")
    if (m != 4294967296L) general
    else {
      val a = id.bitwiseAND(lit(4294967295L))
      val hi = shiftright(a, 16) * Knuth // ≤ (2^16−1)·K < 2^48: no overflow
      val lo = a.bitwiseAND(lit(65535L)) * Knuth
      val fast = (shiftleft(hi.bitwiseAND(lit(65535L)), 16) + lo)
        .bitwiseAND(lit(4294967295L))
      when(id >= 0, fast).otherwise(general)
    }
  }

  /** Two-modulus polynomial char-fold over a string column: 63
    * well-defined bits (h1 mod 2^31−1 in the high word, h2 mod the
    * largest 32-bit prime in the low), every step exact in Int64 — the
    * SAME hash is computable in the DuckDB oracle via `list_reduce` over
    * `ord(substr(...))`, which is what makes the sketch operators
    * (SimHash, KMV, CMS, Bloom) engine-exact rather than
    * implementation-specific. Dispatches to the native codegen'd
    * [[PolyFold64]] expression; [[polyFold64Hof]] keeps the built-ins-only
    * form for the equivalence spec.
    */
  def polyFold64(s: Column): Column = PolyFold64Expr.polyFold64(s)

  /** The same fold via higher-order built-ins (ascii code points) — the
    * reference implementation the native expression is pinned against.
    */
  def polyFold64Hof(s: Column): Column = {
    def fold(base: Int, mod: Long) = aggregate(
      transform(sequence(lit(1), length(s)),
        i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(0L), (acc, c) => (acc * base + c) % mod)
    fold(131, 2147483647L) * lit(4294967296L) + fold(257, 4294967291L)
  }

  /** Driver-side twin of [[polyFold64]] for literal probe strings (probe
    * bucket ids can then be computed once on the driver instead of
    * re-folding per row). Identical arithmetic: ASCII code points, exact
    * Int64.
    */
  def polyFold64Lit(s: String): Long = {
    def fold(base: Long, mod: Long): Long =
      s.foldLeft(0L)((acc, c) => (acc * base + c.toLong) % mod)
    fold(131, 2147483647L) * 4294967296L + fold(257, 4294967291L)
  }
}
