package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the batch `q_sessionize`
  * semantics (a >gap silence closes the session) as an incremental
  * `flatMapGroupsWithState` with EVENT-TIME timeouts.
  *
  * State per key is one open session (start, last, count) — O(1)
  * bytes, unbounded keys TTL'd by the timeout. A session is emitted
  * when a same-key event arrives more than `gap` after the previous
  * one, or when the WATERMARK passes last+gap (the open session can
  * no longer be extended by any non-late event — this is what makes
  * the streaming output converge to the batch answer instead of
  * holding the last session forever).
  *
  * Scale shape: one shuffle keyed on the session key; per-key state
  * is constant-size; the timeout sweep is Structured Streaming's own
  * state-store scan, not a job over the stream history.
  *
  * Late-data contract: events older than the watermark are dropped by
  * the ENGINE before they reach the state function (standard
  * watermarked-stateful semantics) — a session closed by timeout is
  * final. Within-watermark out-of-order events extend the open
  * session correctly (min/max, not first/last).
  */
object StreamingSessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startMillis: Long, lastMillis: Long, n: Long)
  case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long
  )

  private def close(uid: Long, s: OpenSession): Session =
    Session(
      uid,
      new java.sql.Timestamp(s.startMillis),
      new java.sql.Timestamp(s.lastMillis),
      s.n
    )

  /** @param events    watermarked event stream (call
    *                  `.withWatermark("ts", ...)` upstream — required
    *                  for EventTimeTimeout)
    * @param gapMillis silence that closes a session
    */
  def sessions(
      events: Dataset[Event],
      gapMillis: Long
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    require(gapMillis > 0, s"gapMillis must be positive, got $gapMillis")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (uid, rows, state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          // watermark passed last+gap: nothing can extend this session
          val done = state.get
          state.remove()
          Iterator.single(close(uid, done))
        } else {
          // micro-batch arrival order is not event-time order
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            open match {
              case Some(s) if t - s.lastMillis > gapMillis =>
                closed += close(uid, s)
                open = Some(OpenSession(t, t, 1))
              case Some(s) =>
                // a within-gap event extends; a late (out-of-order
                // across batches) event still counts into the open
                // session but cannot move its end backwards
                open = Some(
                  OpenSession(s.startMillis min t, s.lastMillis max t, s.n + 1)
                )
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastMillis + gapMillis)
          }
          closed.result().iterator
        }
      }
  }

  /** DataFrame adapter: (user_id, ts) in, closed-session stream out.
    * The watermark is (re)applied AFTER the projection — a select/cast
    * produces fresh attributes without the upstream watermark tag, and
    * EventTimeTimeout refuses to run unwatermarked.
    */
  def sessionsDF(
      df: DataFrame,
      gapMillis: Long,
      delayThreshold: String = "0 seconds"
  ): Dataset[Session] = {
    import df.sparkSession.implicits._
    sessions(
      df.select(col("user_id").cast("long"), col("ts").cast("timestamp"))
        .withWatermark("ts", delayThreshold)
        .as[Event],
      gapMillis
    )
  }
}
