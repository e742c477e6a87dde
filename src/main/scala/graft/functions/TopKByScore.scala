package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for [[TopKByScore]]. Field order matters:
  * the untyped `udaf(...)` call binds columns to constructor parameters
  * positionally — `topk(col("cosine"), col("vec_id"))`.
  */
case class ScoredId(score: Double, id: Long)

/** Partial top-k by (score desc, id asc) — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(query))`: a window funnels EVERY
  * scored candidate of a query through one partition before ranking, while
  * this aggregator map-side-combines each partition down to k rows, so the
  * shuffle carries O(k) per group instead of O(candidates). Ties break on
  * ascending id — byte-identical output to the window form (asserted by
  * the q_cosine_topk oracle hash and SkewTopKSpec).
  *
  * Duplicate candidates — identical (score, id) pairs, as produced by a
  * multi-table LSH union where the same pair surfaces from several tables
  * — are deduplicated inside the aggregation, so callers need no separate
  * `distinct()` (which would cost its own full-candidate shuffle). Two
  * entries sharing an id but NOT a score are treated as distinct
  * candidates; feed deterministic scores.
  *
  * Registered via `functions.udaf(...)` it runs as an ObjectHashAggregate
  * with partial+final phases, exactly like a built-in aggregate.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private val ord: Ordering[ScoredId] =
    Ordering.by(s => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    // skip the sort when the candidate can't displace anything (an exact
    // duplicate of the current worst is also correctly skipped here)
    if (buf.length >= k && ord.gteq(in, buf.last)) buf
    else ((buf :+ in).distinct.sorted(ord)).take(k)
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).distinct.sorted(ord).take(k)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
