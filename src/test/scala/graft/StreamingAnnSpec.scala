package graft

import graft.operators.Similarity
import graft.streaming.StreamingAnn

/** Streamed ANN-index maintenance ≡ the batch refresh: same fingerprint,
  * two checkpoint incarnations, and the second batch encodes ONLY the
  * delta — the property that makes per-micro-batch maintenance viable at
  * corpus scale.
  */
class StreamingAnnSpec extends SparkTestBase {

  test("drained codes fingerprint ≡ the batch incremental refresh") {
    val streamed = StreamingAnn.annCodesAvailableNow(spark, sf).collect()
    val batch = Similarity.ivfPqRefresh(spark, sf).collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("resume shape: two incarnations, delta-only encode, same result") {
    val fast = StreamingAnn.annCodesAvailableNow(spark, sf).collect().toSeq
    assert(StreamingAnn.lastNumBatches.get() == 2,
      "one-incarnation drain must still deliver per-file micro-batches")
    val resumed = StreamingAnn
      .annCodesAvailableNow(spark, sf, resumeProof = true).collect().toSeq
    assert(StreamingAnn.lastNumBatches.get() == 2)
    val rows = StreamingAnn.lastBatchRows.get().reverse
    assert(rows.length == 2)
    val nBase = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.head == nBase, s"first batch must encode the base corpus: $rows")
    assert(rows(1) == 100L, s"second batch must encode ONLY the delta: $rows")
    assert(resumed == fast,
      "checkpoint-resumed maintenance must equal the one-incarnation drain")
  }
}
