package graft

import graft.operators.JoinEstimate

/** The KMV join-size estimator must actually estimate: with k=256 the
  * key-universe estimate carries ~1/√k ≈ 6% standard error, so a 15%
  * gate catches the failure modes that keep the oracle green but break
  * the operator's point — a non-uniform hash (the 32-bit constant mod
  * 2^62 left small ids unwrapped and estimated 1.7e9 keys where 15000
  * existed) or a broken members-only probe.
  */
class JoinEstimateSpec extends SparkTestBase {

  test("estimated join size lands within 15% of the exact answer") {
    val r = JoinEstimate.joinSizeEstimate(spark, sf).collect().head
    val relErr = r.getAs[Double]("rel_err")
    assert(relErr < 0.15, s"join estimate off by ${relErr * 100}%")
    val estKeys = r.getAs[Long]("est_keys")
    val exact = r.getAs[Long]("exact_join_rows")
    assert(estKeys > 0 && exact > 0)
  }
}
