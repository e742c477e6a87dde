package graft

import graft.operators.Privacy
import graft.streaming.StreamingPii

/** Streaming PII census: drained state must equal the batch census
  * bit-for-bit (the census is mergeable integer sums), with the corpus
  * arriving as two micro-batches; the two-incarnation checkpoint-resume
  * shape is pinned equal to the declared one-incarnation drain.
  */
class StreamingPiiSpec extends SparkTestBase {

  test("drained census == batch census; the split fed at least two batches") {
    val streamed = StreamingPii.piiCensusAvailableNow(spark, sf)
      .collect().map(_.toString).toSeq
    assert(StreamingPii.lastNumBatches.get >= 2,
      "the two-incarnation drain must process both staged batches")
    val batch = Privacy.piiScrub(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed == batch,
      "stream-maintained census must equal the batch census")
    // the two-incarnation checkpoint-resume shape agrees
    val resumed = StreamingPii
      .piiCensusAvailableNow(spark, sf, resumeProof = true)
      .collect().map(_.toString).toSeq
    assert(StreamingPii.lastNumBatches.get >= 2)
    assert(resumed == streamed)
  }
}
