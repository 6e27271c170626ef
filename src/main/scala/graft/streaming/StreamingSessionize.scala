package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the batch `q_sessionize`
  * semantics (a >gap silence closes the session) as an incremental
  * `flatMapGroupsWithState` with EVENT-TIME timeouts.
  *
  * State per key is the set of OPEN session intervals — the classic
  * session-window merge algorithm: an event lands in every interval it
  * is within `gap` of (bridging two intervals merges them), otherwise
  * it opens a new interval. Holding intervals rather than a single
  * open session is what keeps within-watermark OUT-OF-ORDER events
  * correct: a late event that belongs to an earlier, still-open
  * interval extends that interval — it can never fuse two intervals
  * separated by more than `gap` into one session. An interval is
  * emitted only once the WATERMARK passes its end+gap, i.e. once no
  * non-late event can still extend or bridge it — so the emitted
  * sessions equal the batch answer for any watermark delay.
  *
  * State is O(open intervals) per key, bounded by (watermark delay /
  * gap) + 1 — constant for a fixed config. One shuffle keyed on the
  * session key; the timeout sweep is Structured Streaming's own
  * state-store scan, not a job over the stream history.
  *
  * Late-data contract: events older than the watermark are dropped by
  * the ENGINE before they reach the state function (standard
  * watermarked-stateful semantics) — an emitted session is final.
  */
object StreamingSessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp)
  case class Interval(startMillis: Long, lastMillis: Long, n: Long)
  case class OpenSessions(intervals: Seq[Interval])
  case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long
  )

  private def close(uid: Long, s: Interval): Session =
    Session(
      uid,
      new java.sql.Timestamp(s.startMillis),
      new java.sql.Timestamp(s.lastMillis),
      s.n
    )

  private def insert(intervals: Seq[Interval], t: Long, gap: Long): Seq[Interval] = {
    val (touching, apart) =
      intervals.partition(iv => t >= iv.startMillis - gap && t <= iv.lastMillis + gap)
    val merged =
      if (touching.isEmpty) Interval(t, t, 1)
      else
        Interval(
          (touching.map(_.startMillis) :+ t).min,
          (touching.map(_.lastMillis) :+ t).max,
          touching.map(_.n).sum + 1
        )
    (apart :+ merged).sortBy(_.startMillis)
  }

  /** Emit every interval the watermark has sealed (end+gap <=
    * watermark), keep the rest as state with the next timeout at the
    * earliest still-open end+gap.
    */
  private def sweep(
      uid: Long,
      intervals: Seq[Interval],
      gap: Long,
      state: GroupState[OpenSessions]
  ): Iterator[Session] = {
    val wm = state.getCurrentWatermarkMs()
    val (ripe, open) = intervals.partition(_.lastMillis + gap <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(OpenSessions(open))
      state.setTimeoutTimestamp(open.map(_.lastMillis).min + gap)
    }
    ripe.sortBy(_.startMillis).map(close(uid, _)).iterator
  }

  /** @param events    event stream — `sessionsDF` applies the
    *                  watermark (required for EventTimeTimeout)
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
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (uid, rows, state: GroupState[OpenSessions]) =>
        val prior = state.getOption.map(_.intervals).getOrElse(Seq.empty)
        val merged =
          if (state.hasTimedOut) prior
          else rows.foldLeft(prior)((ivs, e) => insert(ivs, e.ts.getTime, gapMillis))
        sweep(uid, merged, gapMillis, state)
      }
  }

  /** DataFrame adapter: (user_id, ts) in, closed-session stream out.
    * The watermark is applied AFTER the projection — a select/cast
    * produces fresh attributes without any upstream watermark tag, and
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
