package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Stateful streaming sessionization — the continuous twin of
  * [[graft.operators.Events.sessionize]] (30-minute inactivity gap), via
  * `flatMapGroupsWithState`: per-user session state with event-time
  * timeouts, so a session is emitted either when a later event of the same
  * user proves the gap, or when the watermark passes the session's gap
  * deadline. State is one small record per ACTIVE user — bounded by the
  * watermark, not by history — the shape that runs forever against a real
  * event feed (the reference's accept-forever loop,
  * `/root/reference/minigoogle.c:49-60`, minus the fork/exec).
  *
  * StreamingSessionizeSpec asserts the emitted sessions equal the batch
  * operator's output on the same data.
  */
object StreamingSessionize {

  val GapMs: Long = 30L * 60 * 1000

  case class Ev(user_id: Long, event_id: Long, ms: Long, ts: Timestamp)
  case class OpenSession(start_ms: Long, end_ms: Long, n: Long)
  case class SessionRow(user_id: Long, session_start_ms: Long,
                        session_end_ms: Long, n_events: Long, duration_s: Long)

  private def close(user: Long, s: OpenSession): SessionRow =
    SessionRow(user, s.start_ms, s.end_ms, s.n, (s.end_ms - s.start_ms) / 1000)

  private[streaming] def stateFn(
      user: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      // watermark passed end+gap: no on-time event can extend this session
      val out = state.getOption.map(close(user, _)).iterator
      state.remove()
      out
    } else {
      val out = scala.collection.mutable.ListBuffer.empty[SessionRow]
      // events within a micro-batch arrive unordered — sort like the batch
      // operator's window key (ms, event_id); cost is bounded per batch
      var cur = state.getOption
      events.toSeq.sortBy(e => (e.ms, e.event_id)).foreach { e =>
        cur match {
          case Some(s) if e.ms - s.end_ms > GapMs =>
            out += close(user, s)
            cur = Some(OpenSession(e.ms, e.ms, 1))
          case Some(s) =>
            cur = Some(OpenSession(s.start_ms, math.max(s.end_ms, e.ms), s.n + 1))
          case None =>
            cur = Some(OpenSession(e.ms, e.ms, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // deadline may already lie behind the watermark for historical
        // data — setTimeoutTimestamp rejects that, so clamp forward: the
        // timeout then fires on the next watermark advance (correct — the
        // session is provably closed)
        state.setTimeoutTimestamp(
          math.max(s.end_ms + GapMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** Streaming sessionization over a watched parquet directory with the
    * events schema. Emits one row per CLOSED session (append mode).
    */
  def sessionStream(spark: SparkSession, watchDir: String): Dataset[SessionRow] = {
    import spark.implicits._
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    spark.readStream
      .schema(schema)
      .parquet(watchDir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(stateFn)
  }

  /** Run the streaming sessionization into an in-memory table (append
    * mode). Caller stops the query.
    */
  def startToMemory(spark: SparkSession, watchDir: String,
                    tableName: String): StreamingQuery =
    sessionStream(spark, watchDir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(tableName)
      .start()
}
