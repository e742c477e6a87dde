package graft

import graft.operators.Covariance
import graft.streaming.StreamingCovariance

/** The streaming-maintained moment cells, drained over two checkpoint
  * incarnations, must assemble into EXACTLY the batch covariance grid —
  * the integer/decimal merge algebra makes "streamed ≡ batch" a
  * bit-for-bit claim, not an approximation.
  */
class StreamingCovarianceSpec extends SparkTestBase {

  test("drained streaming moment state equals the batch grid bit-for-bit") {
    val got = StreamingCovariance
      .covarianceGridAvailableNow(spark, sf).collect().toSeq
    // one incarnation, per-file micro-batches: the merge still ran
    assert(StreamingCovariance.lastNumBatches.get() >= 2,
      s"expected >=2 micro-batches, got ${StreamingCovariance.lastNumBatches.get()}")
    val batch = Covariance.covarianceGrid(spark, sf).collect().toSeq
    assert(got === batch)
    assert(got.nonEmpty)
    // the two-incarnation checkpoint-resume shape agrees with the
    // one-incarnation drain — the resume proof the declared query dropped
    val resumed = StreamingCovariance
      .covarianceGridAvailableNow(spark, sf, resumeProof = true)
      .collect().toSeq
    assert(StreamingCovariance.lastNumBatches.get() >= 2)
    assert(resumed === got)
  }
}
