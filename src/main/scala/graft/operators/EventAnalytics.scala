package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream: ordered funnels,
  * retention cohorts, rolling distinct actors, and touch attribution.
  *
  * Reference scope: thoth profiles metric SERIES but has no event-grain
  * analytics; these are the companion operators a clickstream/telemetry
  * corpus needs at scale (the same shapes BI engines special-case).
  * Every operator here is one or two shuffles keyed on the actor id —
  * no self-join of the raw event table, no driver-side state:
  *
  *   - funnel: one groupBy(user) carrying a sorted (ts, step) array,
  *     folded by a codegen'd higher-order `aggregate` — the per-user
  *     array holds only FUNNEL-step events, not the whole history.
  *   - retention: distinct activity grain (user, day), first-day via
  *     re-aggregation of that same grain (the join rides the exchange
  *     the distinct already produced).
  *   - rolling distinct: exact path expands the (user, day) grain by
  *     the window length (×W rows of the DISTINCT grain, not the raw
  *     events); sketch path keeps one HLL per day — mergeable, so the
  *     window union is day-grain tiny no matter how many actors.
  *   - attribution: a single ROWS-frame window max per user — the
  *     as-of "most recent touch" without a range self-join.
  */
object EventAnalytics {

  /** Ordered-funnel conversion: for each prefix of `steps`, how many
    * users performed those steps in strict timestamp order. A step
    * counts only if it happens strictly AFTER the previous step's
    * earliest valid completion (chained-min semantics: t1 = min ts of
    * step1; t_i = min ts of step_i with ts > t_{i-1}) — equivalent to
    * the greedy walk this implements, and deterministic under
    * same-timestamp ties because an event at ts == t_{i-1} never
    * advances.
    *
    * Emits one row per step (missing conversions count 0), so the
    * report shape is stable even on corpora where nobody converts.
    */
  def funnelSteps(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: steps must be non-empty")
    require(steps.distinct == steps, "funnelSteps: steps must be distinct")
    val spark = events.sparkSession

    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    // Sorted per-user walk: state = (steps reached, ts of last advance).
    // sort_array orders the struct lexicographically (ts first), so the
    // fold sees events in time order; equal-ts order is irrelevant under
    // the strict `>` advance condition.
    // tsCol is cast to timestamp like interArrival does: epoch-second
    // BIGINT event times are a common telemetry shape, and without the
    // cast the fold seed's `null AS timestamp` cannot coerce against a
    // struct<…, last_ts: bigint> — AnalysisException instead of a result
    val perUser = events
      .filter(col(typeCol).isin(steps: _*))
      .select(
        col(userCol).as("_u"),
        struct(col(tsCol).cast("timestamp").as("ts"), stepIdx.as("step")).as("_e")
      )
      .groupBy("_u")
      .agg(sort_array(collect_list(col("_e"))).as("_evs"))
      .select(
        aggregate(
          col("_evs"),
          struct(
            lit(0).as("reached"),
            lit(null).cast("timestamp").as("last_ts")
          ),
          (st, e) =>
            when(
              e.getField("step") === st.getField("reached") &&
                (st.getField("reached") === 0 ||
                  e.getField("ts") > st.getField("last_ts")),
              struct(
                (st.getField("reached") + 1).as("reached"),
                e.getField("ts").as("last_ts")
              )
            ).otherwise(st)
        ).getField("reached").as("_reached")
      )

    // A user who reached step k contributes to steps 1..k; explode at
    // user grain (≤ |steps| rows each), then count — fully distributed,
    // no running-sum window over the tiny result needed.
    val counts = perUser
      .filter(col("_reached") >= 1)
      .select(explode(sequence(lit(1), col("_reached"))).as("step_idx"))
      .groupBy("step_idx")
      .agg(count(lit(1)).as("users"))

    // Stable spine: every step appears, zero-filled.
    import spark.implicits._
    val spine = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }
      .toDF("step_idx", "step")
    spine
      .join(counts, Seq("step_idx"), "left")
      .select(
        col("step_idx"),
        col("step"),
        coalesce(col("users"), lit(0L)).as("users")
      )
      .orderBy("step_idx")
  }

  /** Per-day ordered-funnel conversion: [[funnelSteps]] with the walk
    * scoped to each (user, day) — the daily conversion series a
    * monitoring pipeline tracks (see
    * [[graft.service.Service.profileEventFunnel]]). Days are the
    * days with at least one funnel-step event; every (day, step) pair
    * is emitted, zero-filled. Same chained-min semantics, same single
    * walk shuffle (keyed on (day, user) instead of user).
    */
  def funnelStepsDaily(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnelStepsDaily: steps must be non-empty")
    require(steps.distinct == steps, "funnelStepsDaily: steps must be distinct")
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    // same timestamp cast as funnelSteps (epoch-long event times)
    val filtered = events
      .filter(col(typeCol).isin(steps: _*))
      .select(
        date_trunc("day", col(tsCol).cast("timestamp")).as("day"),
        col(userCol).as("_u"),
        struct(col(tsCol).cast("timestamp").as("ts"), stepIdx.as("step")).as("_e")
      )
    val perUserDay = filtered
      .groupBy("day", "_u")
      .agg(sort_array(collect_list(col("_e"))).as("_evs"))
      .select(
        col("day"),
        aggregate(
          col("_evs"),
          struct(
            lit(0).as("reached"),
            lit(null).cast("timestamp").as("last_ts")
          ),
          (st, e) =>
            when(
              e.getField("step") === st.getField("reached") &&
                (st.getField("reached") === 0 ||
                  e.getField("ts") > st.getField("last_ts")),
              struct(
                (st.getField("reached") + 1).as("reached"),
                e.getField("ts").as("last_ts")
              )
            ).otherwise(st)
        ).getField("reached").as("_reached")
      )
    val counts = perUserDay
      .filter(col("_reached") >= 1)
      .select(col("day"), explode(sequence(lit(1), col("_reached"))).as("step_idx"))
      .groupBy("day", "step_idx")
      .agg(count(lit(1)).as("users"))
    // (observed day × step) spine by exploding a LITERAL step array per
    // day row — no join (a literal-keyed join constant-folds into a
    // nested loop, which the plan audit bans)
    val stepLits = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"))
    }
    val spine = filtered
      .select(col("day"))
      .distinct()
      .select(col("day"), explode(array(stepLits: _*)).as("_s"))
      .select(col("day"), col("_s.step_idx").as("step_idx"), col("_s.step").as("step"))
    spine
      .join(counts, Seq("day", "step_idx"), "left")
      .select(
        col("day"),
        col("step_idx"),
        col("step"),
        coalesce(col("users"), lit(0L)).as("users")
      )
      .orderBy("day", "step_idx")
  }

  /** Retention cohort matrix: users grouped by their first active day,
    * counted on each later day they return (day offsets 0..maxOffsetDays).
    * Activity is de-duplicated to (user, day) grain first, so a chatty
    * user counts once per day; the first-day aggregate and the join
    * back both ride the user-keyed exchange that distinct produced.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxOffsetDays: Int
  ): DataFrame = {
    val act = events
      .select(
        col(userCol).as("_u"),
        date_trunc("day", col(tsCol)).as("_d")
      )
      .distinct()
    val first = act.groupBy("_u").agg(min("_d").as("cohort_day"))
    act
      .join(first, "_u")
      .select(
        col("cohort_day"),
        datediff(col("_d"), col("cohort_day")).cast("long").as("offset_day")
      )
      .filter(col("offset_day") <= maxOffsetDays)
      .groupBy("cohort_day", "offset_day")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_day", "offset_day")
  }

  /** Exact trailing-window distinct actors per day: for each observed
    * activity day, how many distinct users were active in the trailing
    * `windowDays`-day window ending that day. The expansion runs at the
    * DISTINCT (user, day) grain — each such row fans out to the ≤W
    * window-end days it can serve — so cost is W × |user-days|, not
    * W × |events|. Output days are restricted to days with activity.
    */
  def rollingDistinct(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int
  ): DataFrame = {
    require(windowDays >= 1, "rollingDistinct: windowDays must be >= 1")
    val du = events
      .select(
        col(userCol).as("_u"),
        date_trunc("day", col(tsCol)).as("_d")
      )
      .distinct()
    val horizon = expr(s"INTERVAL ${windowDays - 1} DAYS")
    val expanded = du
      .select(
        explode(
          sequence(col("_d"), col("_d") + horizon, expr("INTERVAL 1 DAY"))
        ).as("day"),
        col("_u")
      )
      .distinct()
    val observed = du.select(col("_d").as("day")).distinct()
    expanded
      .join(observed, Seq("day"), "left_semi")
      .groupBy("day")
      .agg(count(lit(1)).as(s"users_${windowDays}d"))
      .orderBy("day")
  }

  /** Sketch-based trailing-window distinct: one HLL sketch per day
    * (the only pass over the raw events), then a day-grain window
    * union. At 100 TB the daily state is |days| × ~1 KB regardless of
    * actor cardinality — this is the mergeable path the exact operator
    * trades precision for. Estimates are rounded to whole actors.
    */
  def rollingDistinctHll(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int,
      lgConfigK: Int = 12
  ): DataFrame = {
    require(windowDays >= 1, "rollingDistinctHll: windowDays must be >= 1")
    // Same fan-out shape as the exact path, but at DAY grain: each daily
    // sketch serves the ≤W window-end days ahead of it, so the union is
    // an equi-keyed hash aggregate — no range join (a range join here
    // plans a nested-loop, which the plan audit bans even when tiny).
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("_d"))
      .agg(hll_sketch_agg(col(userCol), lit(lgConfigK)).as("_sk"))
    val horizon = expr(s"INTERVAL ${windowDays - 1} DAYS")
    val expanded = daily.select(
      explode(
        sequence(col("_d"), col("_d") + horizon, expr("INTERVAL 1 DAY"))
      ).as("day"),
      col("_sk")
    )
    val observed = daily.select(col("_d").as("day"))
    expanded
      .join(observed, Seq("day"), "left_semi")
      .groupBy("day")
      .agg(
        hll_sketch_estimate(hll_union_agg(col("_sk")))
          .as(s"approx_users_${windowDays}d")
      )
      .orderBy("day")
  }

  /** First-order transition matrix over each user's event sequence:
    * counts and row-normalized probabilities of (previous event type →
    * next event type), ordered by the (ts, idCol) total order — the
    * Markov-chain view of user behavior. One lag window per user is
    * the only event-grain pass; normalization windows over the
    * |types|² aggregated matrix, not the events.
    */
  def eventTransitions(
      events: DataFrame,
      userCol: String,
      idCol: String,
      typeCol: String,
      tsCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val counts = events
      .select(col(userCol), col(idCol), col(typeCol), col(tsCol))
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    counts
      .withColumn(
        "prob",
        graft.functions.round6(col("n") / sum(col("n")).over(byFrom))
      )
      .orderBy("from_type", "to_type")
  }

  /** Conversion-latency distribution between two funnel steps: time
    * from each user's FIRST `fromStep` event to their first `toStep`
    * event strictly after it. One summary row: `(from_step, to_step,
    * n_users, n_converted, p25_sec, p50_sec, p90_sec, mean_sec)` —
    * the "how fast do converters convert" companion to
    * [[funnelSteps]]' "how many convert".
    *
    * Latency is computed in exact integer MICROseconds (engine-safe —
    * second-truncating each endpoint first would disagree with
    * truncating the difference), divided once into seconds;
    * percentiles are exact (quantile-parity policy) and the mean runs
    * through DECIMAL sums. Scale shape: two filtered min-aggregations
    * and one user-keyed join — all map-side-combinable; the summary is
    * a single-row rollup with the cohort size broadcast back.
    */
  def conversionLatency(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      fromStep: String,
      toStep: String
  ): DataFrame = {
    val a = events
      .filter(col(typeCol) === fromStep)
      .groupBy(col(userCol).as("_u"))
      .agg(min(col(tsCol)).as("_ta"))
    val b = events
      .filter(col(typeCol) === toStep)
      .select(col(userCol).as("_u"), col(tsCol).as("_tb"))
    val lat = a
      .join(b, "_u")
      .where(col("_tb") > col("_ta"))
      .groupBy(col("_u"), col("_ta"))
      .agg(min(col("_tb")).as("_tb"))
      .select(
        ((unix_micros(col("_tb")) - unix_micros(col("_ta"))) / lit(1000000.0))
          .as("_lat")
      )
    val nUsers = a.agg(count(lit(1)).as("n_users"))
    lat
      .agg(
        lit(fromStep).as("from_step"),
        lit(toStep).as("to_step"),
        count(lit(1)).as("n_converted"),
        graft.functions.round6(percentile(col("_lat"), lit(0.25))).as("p25_sec"),
        graft.functions.round6(percentile(col("_lat"), lit(0.5))).as("p50_sec"),
        graft.functions.round6(percentile(col("_lat"), lit(0.9))).as("p90_sec"),
        graft.functions.round6(
          sum(col("_lat").cast(org.apache.spark.sql.types.DecimalType(38, 10)))
            .cast("double") / count(lit(1))
        ).as("mean_sec")
      )
      .crossJoin(broadcast(nUsers))
      .select(
        col("from_step"),
        col("to_step"),
        col("n_users"),
        col("n_converted"),
        col("p25_sec"),
        col("p50_sec"),
        col("p90_sec"),
        col("mean_sec")
      )
  }

  /** Last-touch attribution: each conversion event is attributed to the
    * same user's most recent `touchType` event strictly before it (by
    * the total order (ts, idCol) — deterministic under ties) and within
    * `windowSec`. One ROWS-frame window per user; no range self-join.
    * Lag is in microseconds (exact integer on both engines).
    */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: String,
      idCol: String,
      typeCol: String,
      tsCol: String,
      touchType: String,
      convType: String,
      windowSec: Long
  ): DataFrame = {
    val w = Window
      .partitionBy(col(userCol))
      .orderBy(col("_ts_us"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(
        col(idCol),
        col(userCol),
        col(typeCol),
        unix_micros(col(tsCol)).as("_ts_us")
      )
      .filter(col(typeCol).isin(touchType, convType))
      .withColumn(
        "_touch_us",
        max(when(col(typeCol) === touchType, col("_ts_us"))).over(w)
      )
      .filter(col(typeCol) === convType)
      .select(
        col(idCol),
        col(userCol),
        (col("_ts_us") - col("_touch_us")).as("touch_lag_us"),
        (col("_touch_us").isNotNull &&
          col("_ts_us") - col("_touch_us") <= windowSec * 1000000L)
          .as("attributed")
      )
      .orderBy(idCol)
  }

  /** Cohort value curve (the LTV table): users grouped by first
    * active day; per (cohort_day, offset_day) — that day's summed
    * value and the running cumulative per cohort: `(cohort_day,
    * offset_day, n_users, revenue, cum_revenue)`. Read along a row:
    * how a cohort's value accrues with age; read down a column:
    * whether newer cohorts monetize faster.
    *
    * Scale shape: first-day attribution rides one user-keyed
    * aggregation; value sums through DECIMAL at (cohort, offset)
    * grain (map-side-combinable); the cumulative is a window per
    * cohort over \|offsets\| rows — grain-level, never raw events.
    */
  def cohortValue(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      maxOffsetDays: Int
  ): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be >= 0, got $maxOffsetDays")
    val dec = org.apache.spark.sql.types.DecimalType(38, 10)
    val withDay = events.select(
      col(userCol).as("_u"),
      date_trunc("day", col(tsCol)).as("_d"),
      col(valueCol).as("_v")
    )
    val first = withDay.groupBy("_u").agg(min("_d").as("cohort_day"))
    val grain = withDay
      .join(first, "_u")
      .withColumn("offset_day", datediff(col("_d"), col("cohort_day")).cast("long"))
      .where(col("offset_day") <= maxOffsetDays)
      .groupBy("cohort_day", "offset_day")
      .agg(
        countDistinct(col("_u")).as("n_users"),
        sum(col("_v").cast(dec)).as("_rev")
      )
    val w = Window
      .partitionBy(col("cohort_day"))
      .orderBy(col("offset_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grain
      .withColumn("_cum", sum(col("_rev")).over(w))
      .select(
        col("cohort_day"),
        col("offset_day"),
        col("n_users"),
        graft.functions.round6(col("_rev").cast("double")).as("revenue"),
        graft.functions.round6(col("_cum").cast("double")).as("cum_revenue")
      )
  }

  /** Per-actor inter-arrival statistics — the burstiness / cadence
    * fingerprint: `(user, n_events, n_gaps, mean_gap_s, p50_gap_s,
    * p90_gap_s, cv)` where gaps are successive event-time deltas and
    * cv = stddev_pop/mean of the gap distribution. cv ≈ 0 is a
    * metronome (bots and cron jobs), cv ≈ 1 is Poisson-human, cv >> 1
    * is bursts — the classic abuse-detection feature.
    *
    * Gaps are EXACT integer microseconds; the variance runs on
    * DECIMAL(38,0) raw moments (a 30-day gap squared overflows BIGINT
    * at ~10^24) so cv is engine-deterministic; percentiles are exact
    * (quantile-parity policy). Zero-mean gap sets (all events at one
    * instant) emit NULL cv. One ordered window per user + one
    * user-keyed aggregation.
    */
  def interArrival(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    // equal timestamps need a total order or the individual gaps (and
    // so p50/p90/cv — though not the telescoping sum) are
    // partition-order-dependent; pass an id column for determinism
    val gaps = events
      .select(
        col(userCol).as("user") +:
          col(tsCol).cast("timestamp").as("_ts") +:
          tieBreak.map(col): _*
      )
      .withColumn(
        "_prev",
        lag(col("_ts"), 1).over(
          Window
            .partitionBy(col("user"))
            .orderBy(col("_ts") +: tieBreak.map(col): _*)
        )
      )
      .withColumn(
        "_gap_us",
        unix_micros(col("_ts")) - unix_micros(col("_prev"))
      )
    gaps
      .groupBy("user")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("_gap_us")).as("n_gaps"),
        sum(col("_gap_us").cast(dec0)).as("_s1"),
        sum((col("_gap_us").cast(org.apache.spark.sql.types.DecimalType(19, 0)) *
          col("_gap_us").cast(org.apache.spark.sql.types.DecimalType(19, 0))))
          .as("_s2"),
        percentile(col("_gap_us"), lit(0.5)).as("_p50"),
        percentile(col("_gap_us"), lit(0.9)).as("_p90")
      )
      .where(col("n_gaps") > 0)
      .select(
        col("user"),
        col("n_events"),
        col("n_gaps"),
        graft.functions.round6(
          col("_s1").cast("double") / col("n_gaps") / lit(1e6)
        ).as("mean_gap_s"),
        graft.functions.round6(col("_p50") / lit(1e6)).as("p50_gap_s"),
        graft.functions.round6(col("_p90") / lit(1e6)).as("p90_gap_s"),
        when(
          col("_s1") > 0,
          graft.functions.round6(
            sqrt(greatest(
              col("_s2").cast("double") / col("n_gaps") -
                (col("_s1").cast("double") / col("n_gaps")) *
                (col("_s1").cast("double") / col("n_gaps")),
              lit(0.0)
            )) / (col("_s1").cast("double") / col("n_gaps"))
          )
        ).as("cv")
      )
  }

  /** Segment contribution analysis — "which segment drove the move":
    * for every consecutive-calendar-day pair and segment, the
    * segment's value delta and its share of the TOTAL day-over-day
    * delta. `(day, segment, value_prev, value, delta, total_delta,
    * contribution)`; contribution is NULL when the total delta is 0
    * (shares of nothing), segments absent on a day count as 0 (a
    * vanished segment shows as a negative contribution instead of a
    * missing row — that's usually the culprit being hunted).
    *
    * Scale shape: one map-side-combinable (day, segment) DECIMAL sum
    * over raw events; everything after runs at |days × segments|
    * grain — the zero-fill spine (constant-key broadcast join, same
    * shape as `Drift.missingDays`), a per-segment lag window, and a
    * per-day total window. Raw data is scanned exactly once.
    */
  def contributionAnalysis(
      df: DataFrame,
      tsCol: String,
      segCol: String,
      valueCol: String,
      maxSegments: Int = 10000
  ): DataFrame = {
    require(maxSegments >= 1, s"maxSegments must be >= 1, got $maxSegments")
    val dec = org.apache.spark.sql.types.DecimalType(38, 10)
    val per = df
      .groupBy(
        date_trunc("day", col(tsCol)).as("day"),
        col(segCol).as("segment")
      )
      .agg(sum(col(valueCol).cast(dec)).as("_v"))
    val days = per.select("day").distinct().withColumn("_k", lit(1))
    // the spine's segment side carries an explicit, generous bound: a
    // drilldown over >10k segments isn't human-readable, and the limit
    // makes the spine join PROVABLY bounded in the plan (the audit's
    // contract); raise it explicitly for programmatic use
    val segs = per
      .select("segment")
      .distinct()
      .orderBy("segment")
      .limit(maxSegments)
      .withColumn("_k", lit(1))
    val filled = days
      .join(broadcast(segs), "_k")
      .drop("_k")
      .join(per, Seq("day", "segment"), "left")
      .withColumn("_v", coalesce(col("_v"), lit(0).cast(dec)))
    val wSeg = Window.partitionBy(col("segment")).orderBy(col("day"))
    val paired = filled
      .withColumn("_prev", lag(col("_v"), 1).over(wSeg))
      .withColumn("_prev_day", lag(col("day"), 1).over(wSeg))
      .where(datediff(col("day"), col("_prev_day")) === 1)
      .withColumn("_delta", col("_v") - col("_prev"))
    // total_delta comes from DAY-GRAIN sums over ALL segments — never
    // from the (possibly capped) segment rows — so contributions stay
    // shares of the metric's REAL move even when rows are capped
    val wDayOrd = Window.orderBy(col("day"))
    val dayTotals = per
      .groupBy("day")
      .agg(sum(col("_v")).as("_dv"))
      .withColumn("_prev_dv", lag(col("_dv"), 1).over(wDayOrd))
      .withColumn("_prev_day", lag(col("day"), 1).over(wDayOrd))
      .where(datediff(col("day"), col("_prev_day")) === 1)
      .select(col("day"), (col("_dv") - col("_prev_dv")).as("_total"))
    paired
      .join(broadcast(dayTotals), "day")
      .select(
        col("day"),
        col("segment"),
        graft.functions.round6(col("_prev").cast("double")).as("value_prev"),
        graft.functions.round6(col("_v").cast("double")).as("value"),
        graft.functions.round6(col("_delta").cast("double")).as("delta"),
        graft.functions.round6(col("_total").cast("double")).as("total_delta"),
        when(
          col("_total") =!= 0,
          graft.functions.round6(
            col("_delta").cast("double") / col("_total").cast("double")
          )
        ).as("contribution")
      )
  }

  /** RFM (recency / frequency / monetary) user segmentation — the
    * classic lifecycle-marketing cut, shaped for scale: each metric
    * is scored 1..4 against the EXACT quartile thresholds of the user
    * population, computed as one tiny percentile aggregation and
    * broadcast back — NOT an `ntile` window, whose global sort over
    * every user is exactly the single-partition bottleneck this
    * library refuses elsewhere. (Consequence: tied boundary values
    * all land on the same side — quartile populations need not be
    * exactly equal. That is the right trade: deterministic scores,
    * no sort.)
    *
    * Scoring convention: 4 is best. Recency scores high when the
    * user's last activity is RECENT (days <= q25 → 4); frequency and
    * monetary score high above their upper quartiles (> q75 → 4).
    * Monetary sums run through DECIMAL and are rounded to 6 dp
    * BEFORE thresholding, so boundary comparisons are
    * engine-deterministic.
    *
    * `(user, recency_days, frequency, monetary, r_score, f_score,
    * m_score, segment)` — one groupBy(user) over raw events + two
    * 1-row broadcasts (reference time, thresholds).
    */
  def rfmSegments(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 10)
    val users = events
      .groupBy(col(userCol).as("user"))
      .agg(
        max(col(tsCol)).as("_last"),
        count(lit(1)).as("frequency"),
        graft.functions
          .round6(sum(col(valueCol).cast(dec)).cast("double"))
          .as("monetary")
      )
    // the reference instant is max over users' last activity — read
    // from the |users|-row aggregate, not a second raw-event scan
    val ref = users.agg(max(col("_last")).as("_ref"))
    val base = users
      .crossJoin(broadcast(ref))
      .withColumn(
        "recency_days",
        datediff(date_trunc("day", col("_ref")), date_trunc("day", col("_last")))
          .cast("long")
      )
    val th = base.agg(
      percentile(col("recency_days"), lit(0.25)).as("r1"),
      percentile(col("recency_days"), lit(0.5)).as("r2"),
      percentile(col("recency_days"), lit(0.75)).as("r3"),
      percentile(col("frequency"), lit(0.25)).as("f1"),
      percentile(col("frequency"), lit(0.5)).as("f2"),
      percentile(col("frequency"), lit(0.75)).as("f3"),
      percentile(col("monetary"), lit(0.25)).as("m1"),
      percentile(col("monetary"), lit(0.5)).as("m2"),
      percentile(col("monetary"), lit(0.75)).as("m3")
    )
    def lowIsGood(v: Column, t1: Column, t2: Column, t3: Column): Column =
      when(v <= t1, 4).when(v <= t2, 3).when(v <= t3, 2).otherwise(1)
    def highIsGood(v: Column, t1: Column, t2: Column, t3: Column): Column =
      when(v > t3, 4).when(v > t2, 3).when(v > t1, 2).otherwise(1)
    base
      .crossJoin(broadcast(th))
      .withColumn(
        "r_score",
        lowIsGood(col("recency_days"), col("r1"), col("r2"), col("r3"))
      )
      .withColumn(
        "f_score",
        highIsGood(col("frequency"), col("f1"), col("f2"), col("f3"))
      )
      .withColumn(
        "m_score",
        highIsGood(col("monetary"), col("m1"), col("m2"), col("m3"))
      )
      .withColumn(
        "segment",
        concat(col("r_score"), col("f_score"), col("m_score"))
      )
      .select(
        "user", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score", "segment"
      )
  }

  /** Sweep-line concurrency over an interval table (sessions, jobs,
    * connections): per time bucket — `(t, starts, ends, net_change,
    * concurrent)` where `concurrent` counts intervals ACTIVE AT THE
    * BUCKET'S END (an interval starting and ending inside one bucket
    * nets to zero there). Only buckets where something starts or ends
    * are emitted; concurrency is constant between them.
    *
    * The naive formulation is an interval self-join ("for each
    * instant, count overlapping sessions") — O(n²) on busy systems.
    * The sweep-line is two scan-side projections (+1 at the start
    * bucket, −1 at the end bucket), ONE map-side-combinable
    * groupBy(bucket), and a running sum over the bucket-grain table —
    * the same window-AFTER-aggregation shape as the rolling-revenue
    * query: the ordered window scans \|buckets with activity\| rows
    * (calendar-bounded at any corpus size), never the interval table.
    *
    * `grain` is any `date_trunc` unit; pick it so the bucket count
    * stays calendar-bounded ("minute" ≈ 526k/year).
    */
  def concurrencyProfile(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      grain: String = "minute"
  ): DataFrame = {
    // OPEN intervals (NULL end) have no sweep events yet: a NULL
    // bucket would sort first and permanently understate every count.
    // They are excluded — close or cap them upstream (the sessionizer
    // emits only closed sessions).
    val closed = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
    val deltas = closed
      .select(date_trunc(grain, col(startCol)).as("t"), lit(1L).as("_d"))
      .unionAll(
        closed
          .select(date_trunc(grain, col(endCol)).as("t"), lit(-1L).as("_d"))
      )
    val w = Window
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .groupBy("t")
      .agg(
        sum(when(col("_d") > 0, 1L).otherwise(0L)).as("starts"),
        sum(when(col("_d") < 0, 1L).otherwise(0L)).as("ends"),
        sum(col("_d")).as("net_change")
      )
      .withColumn("concurrent", sum(col("net_change")).over(w))
  }
}
