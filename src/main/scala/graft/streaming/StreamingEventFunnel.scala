package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel conversion — the batch
  * [[graft.operators.EventAnalytics.funnelSteps]] semantics (strict
  * chained-min step order) as an incremental `flatMapGroupsWithState`
  * with event-time timeouts.
  *
  * The funnel walk is ORDER-SENSITIVE, so an event may only be folded
  * into the walk once no earlier event can still arrive — i.e. once
  * the watermark has passed its timestamp. Events above the watermark
  * wait in a per-user pending buffer; each batch (and each event-time
  * timer firing) folds the newly-confirmed prefix in timestamp order
  * and emits a completion row per step advanced. Emitted completions
  * therefore EQUAL the batch walk on the same data for any
  * within-watermark arrival order — an out-of-order step cannot be
  * skipped, and a step can never be confirmed early.
  *
  * State per user: the walk cursor (reached, last advance ts — 16
  * bytes) plus the pending buffer, bounded by that user's FUNNEL
  * events inside the watermark delay (the same boundedness class as
  * the sessionizer's open intervals). Users who complete the funnel
  * drop their state entirely. Late events beyond the watermark are
  * dropped by the engine before the state function sees them
  * (standard watermarked-stateful contract).
  */
object StreamingEventFunnel {

  /** `step` is the 0-based funnel index of the event's type (the DF
    * adapter maps type strings; non-funnel events must be filtered
    * out before grouping).
    */
  case class StepEvent(user_id: Long, step: Int, ts: java.sql.Timestamp)

  case class FunnelState(
      reached: Int,
      lastMillis: Long,
      pending: Seq[(Long, Int)]
  )

  /** A user advancing to step `step_idx` (1-based) at event time `ts`. */
  case class StepCompletion(user_id: Long, step_idx: Int, ts: java.sql.Timestamp)

  def completions(
      events: Dataset[StepEvent],
      nSteps: Int
  ): Dataset[StepCompletion] = {
    import events.sparkSession.implicits._
    require(nSteps >= 1, s"nSteps must be >= 1, got $nSteps")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepCompletion](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (uid, rows, state: GroupState[FunnelState]) =>
        val prior = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Nil))
        val pending =
          prior.pending ++ rows.map(e => (e.ts.getTime, e.step))
        val wm = state.getCurrentWatermarkMs()
        // fold ONLY the watermark-confirmed prefix, in time order;
        // equal-ts order is irrelevant under the strict `>` advance
        val (ripe, hold) = pending.partition(_._1 <= wm)
        var reached = prior.reached
        var last = prior.lastMillis
        val out = Seq.newBuilder[StepCompletion]
        ripe.sorted.foreach { case (t, s) =>
          if (
            reached < nSteps && s == reached &&
            (reached == 0 || t > last)
          ) {
            reached += 1
            last = t
            out += StepCompletion(uid, reached, new java.sql.Timestamp(t))
          }
        }
        val done = reached >= nSteps
        if (hold.isEmpty || done) {
          if (reached == 0 || done) state.remove()
          else state.update(FunnelState(reached, last, Nil))
        } else {
          state.update(FunnelState(reached, last, hold))
          // fire when the watermark confirms the earliest held event,
          // even if the user never sends another event
          state.setTimeoutTimestamp(hold.map(_._1).min)
        }
        out.result().iterator
      }
  }

  /** DataFrame adapter: (user_id, event_type, ts) in, step-completion
    * stream out. Filters to funnel step types scan-side and applies
    * the watermark AFTER the projection (fresh attributes carry no
    * upstream watermark tag, and EventTimeTimeout requires one).
    */
  def completionsDF(
      df: DataFrame,
      typeCol: String,
      userCol: String,
      tsCol: String,
      steps: Seq[String],
      delayThreshold: String = "0 seconds"
  ): Dataset[StepCompletion] = {
    import df.sparkSession.implicits._
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct == steps, "steps must be distinct")
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    completions(
      df.where(col(typeCol).isin(steps: _*))
        .select(
          col(userCol).cast("long").as("user_id"),
          stepIdx.as("step"),
          col(tsCol).cast("timestamp").as("ts")
        )
        .withWatermark("ts", delayThreshold)
        .as[StepEvent],
      steps.size
    )
  }
}
