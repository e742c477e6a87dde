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
    // two incarnations over one checkpoint: the resume actually happened
    assert(StreamingCovariance.lastNumBatches.get() >= 2,
      s"expected >=2 micro-batches, got ${StreamingCovariance.lastNumBatches.get()}")
    val batch = Covariance.covarianceGrid(spark, sf).collect().toSeq
    assert(got === batch)
    assert(got.nonEmpty)
  }
}
