package graft.queries

import graft.Tables
import graft.operators.EventAnalytics

/** Event-grain product analytics (SURVEY §2.3 rows 30p-30t): ordered
  * funnel, retention cohorts, rolling distinct actors (exact + HLL
  * sketch), and last-touch attribution over the `events` table. The
  * sketch variant is rows-only (estimates have no exact SQL mirror);
  * everything else is oracle-gated.
  */
object EventQueries extends QueryPack {

  private val funnelStepList = Seq("view", "click", "purchase")

  // Revenue concentration: what share of total value the top 1% /
  // 10% / 50% of users carry — whale-dependence in one row, via
  // exact percentile thresholds broadcast back (no global user sort);
  // DECIMAL user sums rounded before thresholding (deterministic
  // boundaries, the RFM convention)
  private val concentrationQ = Q(
    fn = (s, d) => {
      import org.apache.spark.sql.functions._
      val dec = org.apache.spark.sql.types.DecimalType(38, 10)
      val users = Tables
        .events(s, d)
        .groupBy(col("user_id"))
        .agg(round6(sum(col("value").cast(dec)).cast("double")).as("_rev"))
      val th = users.agg(
        percentile(col("_rev"), lit(0.99)).as("_q99"),
        percentile(col("_rev"), lit(0.9)).as("_q90"),
        percentile(col("_rev"), lit(0.5)).as("_q50")
      )
      users
        .crossJoin(broadcast(th))
        .agg(
          count(lit(1)).as("n_users"),
          round6(sum(col("_rev"))).as("total"),
          round6(
            sum(when(col("_rev") >= col("_q99"), col("_rev")).otherwise(0.0)) /
              sum(col("_rev"))
          ).as("share_top1pct"),
          round6(
            sum(when(col("_rev") >= col("_q90"), col("_rev")).otherwise(0.0)) /
              sum(col("_rev"))
          ).as("share_top10pct"),
          round6(
            sum(when(col("_rev") >= col("_q50"), col("_rev")).otherwise(0.0)) /
              sum(col("_rev"))
          ).as("share_top50pct")
        )
    },
    oracle = Some("""
      WITH u AS (SELECT user_id,
          round(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
            AS rev
        FROM events GROUP BY 1),
      t AS (SELECT quantile_cont(rev, 0.99) AS q99,
          quantile_cont(rev, 0.9) AS q90,
          quantile_cont(rev, 0.5) AS q50 FROM u)
      SELECT count(*) AS n_users, round(SUM(rev), 6) AS total,
        round(SUM(CASE WHEN rev >= q99 THEN rev ELSE 0.0 END)
          / SUM(rev), 6) AS share_top1pct,
        round(SUM(CASE WHEN rev >= q90 THEN rev ELSE 0.0 END)
          / SUM(rev), 6) AS share_top10pct,
        round(SUM(CASE WHEN rev >= q50 THEN rev ELSE 0.0 END)
          / SUM(rev), 6) AS share_top50pct
      FROM u, t""")
  )

  // Cohort LTV curve: per (cohort first-day, age) revenue + running
  // cumulative — DECIMAL sums, windows at cohort-grain only
  private val cohortValueQ = Q(
    fn = (s, d) =>
      EventAnalytics
        .cohortValue(Tables.events(s, d), "user_id", "ts", "value",
          maxOffsetDays = 30)
        .orderBy("cohort_day", "offset_day"),
    oracle = Some("""
      WITH e AS (SELECT user_id AS u,
          CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, value AS v
        FROM events),
      f AS (SELECT u, min(d) AS cohort_day FROM e GROUP BY 1),
      g AS (SELECT f.cohort_day,
          CAST(date_diff('day', f.cohort_day, e.d) AS BIGINT) AS offset_day,
          count(DISTINCT e.u) AS n_users,
          SUM(CAST(e.v AS DECIMAL(38,10))) AS rev
        FROM e JOIN f ON e.u = f.u
        WHERE date_diff('day', f.cohort_day, e.d) <= 30
        GROUP BY 1, 2)
      SELECT cohort_day, offset_day, n_users,
        round(CAST(rev AS DOUBLE), 6) AS revenue,
        round(CAST(SUM(rev) OVER (PARTITION BY cohort_day ORDER BY offset_day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
          AS cum_revenue
      FROM g ORDER BY cohort_day, offset_day""")
  )

  // Per-user cadence fingerprint: exact-microsecond gap statistics
  // with DECIMAL raw moments; (ts, event_id) total order so ties
  // cannot move the percentiles between engines
  private val interArrivalQ = Q(
    fn = (s, d) =>
      EventAnalytics
        .interArrival(Tables.events(s, d), "user_id", "ts",
          tieBreak = Seq("event_id"))
        .withColumnRenamed("user", "user_id")
        .orderBy("user_id"),
    oracle = Some("""
      WITH g AS (SELECT user_id,
          epoch_us(ts) - epoch_us(lag(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        FROM events),
      a AS (SELECT user_id, count(*) AS n_events, count(gap) AS n_gaps,
          CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS s1,
          CAST(SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0)))
            AS DOUBLE) AS s2,
          quantile_cont(gap, 0.5) AS p50,
          quantile_cont(gap, 0.9) AS p90
        FROM g GROUP BY 1)
      SELECT user_id, n_events, n_gaps,
        round(s1 / n_gaps / 1e6, 6) AS mean_gap_s,
        round(p50 / 1e6, 6) AS p50_gap_s,
        round(p90 / 1e6, 6) AS p90_gap_s,
        CASE WHEN s1 > 0 THEN
          round(sqrt(greatest(s2 / n_gaps -
            (s1 / n_gaps) * (s1 / n_gaps), 0.0)) / (s1 / n_gaps), 6)
        END AS cv
      FROM a WHERE n_gaps > 0 ORDER BY user_id""")
  )

  // Path analysis: the top opening event sequences (first 3 events
  // per user, deterministic (ts, event_id) order) — "how do journeys
  // start"; per-user arrays hold <= 3 entries by construction, the
  // path table map-side-combines, the head is a TakeOrdered
  private val topPathsQ = Q(
    fn = (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables
        .events(s, d)
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") <= 3)
        .groupBy("user_id")
        .agg(
          concat_ws(
            ">",
            transform(
              array_sort(collect_list(struct(col("_rn"), col("event_type")))),
              x => x.getField("event_type")
            )
          ).as("path")
        )
        .groupBy("path")
        .agg(count(lit(1)).as("users"))
        .orderBy(col("users").desc, col("path"))
        .limit(20)
    },
    oracle = Some("""
      WITH r AS (SELECT user_id, event_type,
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS rn
        FROM events),
      p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
          AS path
        FROM r WHERE rn <= 3 GROUP BY 1)
      SELECT path, count(*) AS users FROM p
      GROUP BY 1 ORDER BY users DESC, path LIMIT 20""")
  )

  // Semi-structured extraction: the JSON props column parsed
  // SCAN-SIDE with an EXPLICIT schema (from_json; no inference pass
  // over the corpus — schema inference at 100 TB is a full extra
  // scan), then an ordinary typed aggregation; malformed documents
  // parse to NULL and are counted, never dropped silently
  private val jsonQ = Q(
    fn = (s, d) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables
        .events(s, d)
        .withColumn("_k", from_json(col("props"), schema).getField("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          count(col("_k")).as("n_parsed"),
          sum(col("_k")).as("sum_k"),
          round6(avg(col("_k"))).as("avg_k")
        )
        .orderBy("event_type")
    },
    oracle = Some("""
      SELECT event_type, count(*) AS n,
        count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_parsed,
        CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
          AS sum_k,
        round(AVG(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS avg_k
      FROM events GROUP BY 1 ORDER BY event_type""")
  )

  // Day-over-day contribution by event type: which segment drove the
  // total's move; absent segments zero-filled so a vanished segment
  // surfaces as negative contribution
  private val contributionQ = Q(
    fn = (s, d) =>
      EventAnalytics
        .contributionAnalysis(Tables.events(s, d), "ts", "event_type", "value")
        .orderBy("day", "segment"),
    oracle = Some("""
      WITH per AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
          event_type AS segment,
          SUM(CAST(value AS DECIMAL(38,10))) AS v
        FROM events GROUP BY 1, 2),
      filled AS (SELECT d.day, s.segment,
          COALESCE(per.v, CAST(0 AS DECIMAL(38,10))) AS v
        FROM (SELECT DISTINCT day FROM per) d
        CROSS JOIN (SELECT DISTINCT segment FROM per) s
        LEFT JOIN per ON per.day = d.day AND per.segment = s.segment),
      paired AS (SELECT *, lag(v) OVER w AS prev, lag(day) OVER w AS prev_day
        FROM filled WINDOW w AS (PARTITION BY segment ORDER BY day)),
      d1 AS (SELECT day, segment, prev, v, v - prev AS delta FROM paired
        WHERE date_diff('day', prev_day, day) = 1),
      t AS (SELECT *, SUM(delta) OVER (PARTITION BY day) AS total FROM d1)
      SELECT day, segment,
        round(CAST(prev AS DOUBLE), 6) AS value_prev,
        round(CAST(v AS DOUBLE), 6) AS value,
        round(CAST(delta AS DOUBLE), 6) AS delta,
        round(CAST(total AS DOUBLE), 6) AS total_delta,
        CASE WHEN total <> 0
          THEN round(CAST(delta AS DOUBLE) / CAST(total AS DOUBLE), 6)
        END AS contribution
      FROM t ORDER BY day, segment""")
  )

  // RFM segmentation: exact-quartile broadcast thresholds, no ntile
  // (a global user sort); 4 = best on every axis
  private val rfmQ = Q(
    fn = (s, d) =>
      EventAnalytics
        .rfmSegments(Tables.events(s, d), "user_id", "ts", "value")
        .withColumnRenamed("user", "user_id")
        .orderBy("user_id"),
    oracle = Some("""
      WITH u AS (SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
          round(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 6)
            AS monetary
        FROM events GROUP BY 1),
      r AS (SELECT max(ts) AS ref FROM events),
      b AS (SELECT u.*, CAST(date_diff('day',
            CAST(date_trunc('day', u.last_ts) AS TIMESTAMP),
            CAST(date_trunc('day', r.ref) AS TIMESTAMP)) AS BIGINT)
          AS recency_days
        FROM u, r),
      t AS (SELECT
          quantile_cont(recency_days, 0.25) AS r1,
          quantile_cont(recency_days, 0.5) AS r2,
          quantile_cont(recency_days, 0.75) AS r3,
          quantile_cont(frequency, 0.25) AS f1,
          quantile_cont(frequency, 0.5) AS f2,
          quantile_cont(frequency, 0.75) AS f3,
          quantile_cont(monetary, 0.25) AS m1,
          quantile_cont(monetary, 0.5) AS m2,
          quantile_cont(monetary, 0.75) AS m3
        FROM b),
      s AS (SELECT b.user_id, b.recency_days, b.frequency, b.monetary,
          CASE WHEN b.recency_days <= t.r1 THEN 4
               WHEN b.recency_days <= t.r2 THEN 3
               WHEN b.recency_days <= t.r3 THEN 2 ELSE 1 END AS r_score,
          CASE WHEN b.frequency > t.f3 THEN 4
               WHEN b.frequency > t.f2 THEN 3
               WHEN b.frequency > t.f1 THEN 2 ELSE 1 END AS f_score,
          CASE WHEN b.monetary > t.m3 THEN 4
               WHEN b.monetary > t.m2 THEN 3
               WHEN b.monetary > t.m1 THEN 2 ELSE 1 END AS m_score
        FROM b, t)
      SELECT user_id, recency_days, frequency, monetary,
        r_score, f_score, m_score,
        CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
          || CAST(m_score AS VARCHAR) AS segment
      FROM s ORDER BY user_id""")
  )

  // Sweep-line concurrent sessions at minute grain: sessions derived
  // with the standard 1800s gap rule, then two +/-1 projections, one
  // bucket groupBy, and a calendar-bounded running sum — never an
  // interval self-join
  private val concurrencyQ = Q(
    fn = (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val sessions = Tables
        .events(s, d)
        .withColumn("_prev", lag(col("ts"), 1).over(byUser))
        .withColumn(
          "_new",
          when(
            col("_prev").isNull ||
              col("ts").cast("timestamp").cast("long") -
              col("_prev").cast("timestamp").cast("long") > 1800,
            1L
          ).otherwise(0L)
        )
        .withColumn("_sid", sum(col("_new")).over(byUser))
        .groupBy(col("user_id"), col("_sid"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      EventAnalytics
        .concurrencyProfile(sessions, "s_start", "s_end", grain = "minute")
        .orderBy("t")
    },
    oracle = Some("""
      WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR CAST(floor(epoch(ts)) AS BIGINT)
                    - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
               THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked),
      iv AS (SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
             FROM sess GROUP BY 1, 2),
      deltas AS (
        SELECT CAST(date_trunc('minute', s_start) AS TIMESTAMP) AS t,
          1 AS d FROM iv
        UNION ALL
        SELECT CAST(date_trunc('minute', s_end) AS TIMESTAMP), -1 FROM iv),
      b AS (SELECT t,
          CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS starts,
          CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS ends,
          CAST(SUM(d) AS BIGINT) AS net_change
        FROM deltas GROUP BY 1)
      SELECT t, starts, ends, net_change,
        CAST(SUM(net_change) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS concurrent
      FROM b ORDER BY t""")
  )

  // Chained-min semantics: t1 = min ts of step1; t_i = min ts of step_i
  // strictly after t_{i-1}. The UNION spine keeps all steps present
  // (zero-filled) exactly like the Spark side's literal spine.
  private val funnelQ = Q(
    fn = (s, d) =>
      EventAnalytics.funnelSteps(
        Tables.events(s, d),
        "user_id",
        "event_type",
        "ts",
        funnelStepList
      ),
    oracle = Some("""
      WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e
             JOIN t1 ON e.user_id = t1.user_id
             WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1),
      t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e
             JOIN t2 ON e.user_id = t2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1)
      SELECT * FROM (
        SELECT 1 AS step_idx, 'view' AS step, count(*) AS users FROM t1
        UNION ALL SELECT 2, 'click', count(*) FROM t2
        UNION ALL SELECT 3, 'purchase', count(*) FROM t3
      ) ORDER BY step_idx""")
  )

  private val funnelDailyQ = Q(
    fn = (s, d) =>
      EventAnalytics.funnelStepsDaily(
        Tables.events(s, d),
        "user_id",
        "event_type",
        "ts",
        funnelStepList
      ),
    oracle = Some(s"""
      WITH e AS (SELECT user_id, event_type, ts,
                   ${sqlDay("ts")} AS d FROM events
                 WHERE event_type IN ('view', 'click', 'purchase')),
      t1 AS (SELECT d, user_id, min(ts) AS ts1 FROM e
             WHERE event_type = 'view' GROUP BY 1, 2),
      t2 AS (SELECT e.d, e.user_id, min(e.ts) AS ts2 FROM e
             JOIN t1 ON e.user_id = t1.user_id AND e.d = t1.d
             WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1, 2),
      t3 AS (SELECT e.d, e.user_id, min(e.ts) AS ts3 FROM e
             JOIN t2 ON e.user_id = t2.user_id AND e.d = t2.d
             WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1, 2),
      c AS (
        SELECT d, 1 AS step_idx, count(*) AS users FROM t1 GROUP BY 1
        UNION ALL SELECT d, 2, count(*) FROM t2 GROUP BY 1
        UNION ALL SELECT d, 3, count(*) FROM t3 GROUP BY 1),
      spine AS (
        SELECT days.d, s.step_idx, s.step
        FROM (SELECT DISTINCT d FROM e) days
        CROSS JOIN (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
          AS s(step_idx, step))
      SELECT spine.d AS day, spine.step_idx AS step_idx, spine.step,
        COALESCE(c.users, 0) AS users
      FROM spine LEFT JOIN c ON spine.d = c.d AND spine.step_idx = c.step_idx
      ORDER BY day, spine.step_idx""")
  )

  private val retentionQ = Q(
    fn = (s, d) =>
      EventAnalytics.retentionCohorts(
        Tables.events(s, d),
        "user_id",
        "ts",
        maxOffsetDays = 7
      ),
    oracle = Some(s"""
      WITH act AS (SELECT DISTINCT user_id AS u,
                     ${sqlDay("ts")} AS d FROM events),
      f AS (SELECT u, min(d) AS cohort_day FROM act GROUP BY 1)
      SELECT f.cohort_day,
        CAST(date_diff('day', f.cohort_day, act.d) AS BIGINT) AS offset_day,
        count(*) AS users
      FROM act JOIN f ON act.u = f.u
      WHERE date_diff('day', f.cohort_day, act.d) <= 7
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  private val rollingDistinctQ = Q(
    fn = (s, d) =>
      EventAnalytics.rollingDistinct(
        Tables.events(s, d),
        "user_id",
        "ts",
        windowDays = 7
      ),
    oracle = Some(s"""
      WITH du AS (SELECT DISTINCT user_id AS u,
                    ${sqlDay("ts")} AS d FROM events),
      days AS (SELECT DISTINCT d AS day FROM du)
      SELECT days.day, count(DISTINCT du.u) AS users_7d
      FROM days JOIN du
        ON du.d BETWEEN days.day - INTERVAL 6 DAY AND days.day
      GROUP BY 1 ORDER BY 1""")
  )

  // Rows-only: HLL estimates are engine-specific; the EventAnalyticsSpec
  // pins the estimate within tolerance of the exact operator above.
  private val rollingHllQ = Q(
    fn = (s, d) =>
      EventAnalytics.rollingDistinctHll(
        Tables.events(s, d),
        "user_id",
        "ts",
        windowDays = 7
      ),
    oracle = None
  )

  private val attributionQ = Q(
    fn = (s, d) =>
      EventAnalytics.lastTouchAttribution(
        Tables.events(s, d),
        userCol = "user_id",
        idCol = "event_id",
        typeCol = "event_type",
        tsCol = "ts",
        touchType = "click",
        convType = "purchase",
        windowSec = 604800L
      ),
    oracle = Some("""
      WITH t AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
                 FROM events WHERE event_type IN ('click', 'purchase')),
      m AS (SELECT *, max(CASE WHEN event_type = 'click' THEN ts_us END)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS touch_us
            FROM t)
      SELECT event_id, user_id, ts_us - touch_us AS touch_lag_us,
        (touch_us IS NOT NULL AND ts_us - touch_us <= 604800000000)
          AS attributed
      FROM m WHERE event_type = 'purchase' ORDER BY event_id""")
  )

  private val transitionsQ = Q(
    fn = (s, d) =>
      EventAnalytics.eventTransitions(
        Tables.events(s, d),
        userCol = "user_id",
        idCol = "event_id",
        typeCol = "event_type",
        tsCol = "ts"
      ),
    oracle = Some("""
      WITH seq AS (
        SELECT user_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev_type
        FROM events),
      c AS (SELECT prev_type AS from_type, event_type AS to_type,
              count(*) AS n
            FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        round(CAST(n AS DOUBLE) /
          SUM(n) OVER (PARTITION BY from_type), 6) AS prob
      FROM c ORDER BY from_type, to_type""")
  )

  // Latency distribution of view -> purchase conversions: exact
  // microsecond lag divided once into seconds; percentiles + DECIMAL
  // mean
  private val latencyQ = Q(
    fn = (s, d) =>
      EventAnalytics.conversionLatency(
        Tables.events(s, d),
        "user_id",
        "event_type",
        "ts",
        "view",
        "purchase"
      ),
    oracle = Some("""
      WITH a AS (SELECT user_id AS u, MIN(ts) AS ta FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      b AS (SELECT e.user_id AS u, MIN(e.ts) AS tb FROM events e
            JOIN a ON e.user_id = a.u
            WHERE e.event_type = 'purchase' AND e.ts > a.ta GROUP BY 1),
      l AS (SELECT a.u,
              (epoch_us(b.tb) - epoch_us(a.ta)) / 1000000.0 AS lat
            FROM a JOIN b ON a.u = b.u)
      SELECT 'view' AS from_step, 'purchase' AS to_step,
        (SELECT COUNT(*) FROM a) AS n_users,
        COUNT(*) AS n_converted,
        round(quantile_cont(lat, 0.25), 6) AS p25_sec,
        round(quantile_cont(lat, 0.5), 6) AS p50_sec,
        round(quantile_cont(lat, 0.9), 6) AS p90_sec,
        round(CAST(SUM(CAST(lat AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6)
          AS mean_sec
      FROM l""")
  )

  val queries: Map[String, Q] = Map(
    "q_concurrency" -> concurrencyQ,
    "q_rfm_segments" -> rfmQ,
    "q_contribution" -> contributionQ,
    "q_json_extract" -> jsonQ,
    "q_top_paths" -> topPathsQ,
    "q_interarrival" -> interArrivalQ,
    "q_cohort_value" -> cohortValueQ,
    "q_revenue_concentration" -> concentrationQ,
    "q_funnel_latency" -> latencyQ,
    "q_event_transitions" -> transitionsQ,
    "q_funnel_steps" -> funnelQ,
    "q_funnel_daily" -> funnelDailyQ,
    "q_retention_cohorts" -> retentionQ,
    "q_rolling_distinct" -> rollingDistinctQ,
    "q_rolling_distinct_hll" -> rollingHllQ,
    "q_attribution" -> attributionQ
  )
}
