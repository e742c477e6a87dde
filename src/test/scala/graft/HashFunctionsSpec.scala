package graft

import org.apache.spark.sql.functions.col

import graft.functions.HashFunctions

class HashFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("knuthMod fast path == exact BigInt reference across the id range") {
    // the range that matters: the naive long fast path would THROW under
    // ANSI at id >= ~3.5e9 and only a spec with big ids catches it
    val ids = Seq(0L, 1L, 7L, 99999L, Int.MaxValue.toLong,
      4294967295L, 4294967296L, 4294967297L,
      3500000000L, 3474851533L, // either side of the 2^63/K overflow line
      1000000000000L, Long.MaxValue, Long.MaxValue - 1,
      -1L, -4294967296L, Long.MinValue + 1)
    val got = ids.toDF("id")
      .select(col("id"), HashFunctions.knuthMod(col("id"), 4294967296L).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val exp = ((BigInt(id) * HashFunctions.Knuth) % BigInt(4294967296L)).toLong
      assert(got(id) === exp, s"id=$id: got ${got(id)}, want $exp")
    }
  }

  test("knuth62Mod == exact BigInt reference across the full id range") {
    // the split fast path's worst case is all-ones halves (the cross
    // term peaks just inside Long.MaxValue); negatives take the decimal
    // fallback; Long.MaxValue would overflow any narrower scheme
    val ids = Seq(0L, 1L, 2L, 7L, 99999L, 4294967296L, 4294967297L,
      2147483647L, 2147483648L, 4611686018427387903L, 4611686018427387904L,
      1000000000000L, Long.MaxValue, Long.MaxValue - 1,
      -1L, -4294967296L, Long.MinValue + 1)
    val got = ids.toDF("id")
      .select(col("id"), HashFunctions.knuth62Mod(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m62 = BigInt(4611686018427387904L)
    ids.foreach { id =>
      val exp = ((BigInt(id) * HashFunctions.Knuth62) % m62).toLong
      assert(got(id) === exp, s"id=$id: got ${got(id)}, want $exp")
    }
    // the property the KMV estimator needs: small CONSECUTIVE ids must
    // wrap (scramble), not stay order-preserving — the 32-bit constant
    // mod 2^62 fails exactly this
    val smallHashes = (1L to 100L).map(i => ((BigInt(i) * HashFunctions.Knuth62) % m62).toLong)
    assert(smallHashes.sliding(2).exists(p => p(1) < p(0)),
      "knuth62Mod is order-preserving on small ids — estimator uniformity broken")
  }

  test("knuthMod general modulus (non power of two) stays exact") {
    val m = 4294967291L // largest prime < 2^32 (the Incremental KMV modulus)
    val ids = Seq(0L, 12345L, 4294967296L, Long.MaxValue)
    val got = ids.toDF("id")
      .select(col("id"), HashFunctions.knuthMod(col("id"), m).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val exp = ((BigInt(id) * HashFunctions.Knuth) % BigInt(m)).toLong
      assert(got(id) === exp)
    }
  }
}
