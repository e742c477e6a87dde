package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * bounded-memory answer to "top terms of a 100 TB corpus": each
  * partition keeps at most k counters regardless of vocabulary size, the
  * shuffle carries O(k) per partition, and merged sketches obey the
  * standard guarantee
  *
  *   true_count − N/(k+1)  ≤  estimate  ≤  true_count
  *
  * (Misra & Gries 1982; mergeability per Agarwal et al., PODS'12: sum
  * counters, then subtract the (k+1)-th largest and drop non-positives).
  * When k ≥ |vocabulary| no decrement ever fires and the sketch is EXACT
  * regardless of partitioning/merge order — which is what makes it
  * oracle-checkable end-to-end on the test corpus while remaining an
  * honest sketch at scale.
  *
  * Run via `functions.udaf(...)` it executes as an ObjectHashAggregate
  * with real partial/final phases, like every built-in aggregate.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < k => buf.updated(term, 1L)
      case None =>
        // decrement all k counters, drop the ones that hit zero
        buf.flatMap { case (t, c) =>
          if (c > 1) Some(t -> (c - 1)) else None
        }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter value, keep positives
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) =>
        if (c - cut > 0) Some(t -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
