package graft.service

import graft.core.{DatasetMeta, Granularity, Metric}
import graft.anomaly.{Optimizer, Scorer}
import graft.profiler.{Profiler, ProfilingBuilder}
import graft.quality.{AnomalousScore, LogHandler, NotificationHandler, Quality}
import graft.repository.MetricsRepository
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline glue (reference: thoth/service_layer.py:157-509).
  *
  * Every pipeline is repo-in/repo-out DataFrames; the only driver-side
  * data are the dataset registration and the (tiny) anomalous subset
  * collected for notification.
  */
object Service {

  /** NULL-ts alert rows (a NULL event-time group is a supported metric
    * key) order first instead of NPEing the assessment on `.getTime`.
    */
  private def tsKey(ts: java.sql.Timestamp): Long =
    if (ts == null) Long.MinValue else ts.getTime

  /** The metric-series key used across optimize/score/assess. */
  val seriesCols: Seq[String] = Seq("entity", "instance", "name")

  /** Metric-name suffix marking series DERIVED by [[assessTrend]];
    * such series are excluded from EVERY base-series scan (trend,
    * optimize, score) so verdict metrics are never themselves
    * modeled, scored, alerted on, or compounded into
    * `<name>_trend_z_trend_z` across runs.
    */
  val trendSuffix: String = "_trend_z"

  /** Companion to [[trendSuffix]]: a 0/1 series recording whether the
    * stored trend verdict was computed on a deterministically THINNED
    * history (series longer than the Mann-Kendall/Theil-Sen maxPoints
    * cap) — an approximated z that fires an alert must say so, all the
    * way to the stored series and the report badge.
    */
  val trendThinnedSuffix: String = "_trend_thinned"

  /** Every metric-name suffix reserved for series DERIVED by the
    * assessment pipelines. Base-series scans exclude these; base
    * metric names must not use them (enforced at [[profileCreate]]).
    */
  val derivedSuffixes: Seq[String] = Seq(trendSuffix, trendThinnedSuffix)

  /** The profiling history restricted to BASE series — the read every
    * modeling/assessment path must use. Derived verdict series
    * ([[derivedSuffixes]]) live in the same table by design (they ride
    * the standard repository/report surfaces) but are diagnostics of
    * metrics, not metrics: training an anomaly model on a z-score
    * series or counting it in health badges is a category error.
    */
  private def baseProfiling(
      datasetUri: String,
      repo: MetricsRepository
  ): DataFrame =
    repo
      .getProfiling(datasetUri)
      .where(
        !derivedSuffixes
          .map(s => col("name").endsWith(s))
          .reduce(_ || _)
      )

  /** Profile a batch and upsert the metrics into the repository,
    * registering the dataset on first sight
    * (reference `profile` + `profile_create`,
    * service_layer.py:157-230).
    */
  def profileCreate(
      df: DataFrame,
      datasetUri: String,
      tsColumn: String,
      repo: MetricsRepository,
      builder: ProfilingBuilder = ProfilingBuilder.default,
      granularity: String = Granularity.Day
  ): DataFrame = {
    // Reserved-suffix names are rejected UP FRONT (driver-side, from
    // the builder's metric list — no job): a base metric named
    // `*_trend_z` would silently vanish from every baseProfiling scan
    // (never optimized, scored, or trend-assessed) and render as a
    // verdict badge in reports. Fail loudly instead.
    val metricNames = builder
      .metricExprs(df.schema.fields.filterNot(_.name == tsColumn).toSeq)
      .map(_._1)
    val reserved = metricNames
      .map(_.name)
      .filter(n => derivedSuffixes.exists(n.endsWith))
      .distinct
    require(
      reserved.isEmpty,
      s"metric names ${reserved.mkString(", ")} end with a reserved derived-series suffix " +
        s"(${derivedSuffixes.mkString(", ")}); rename the metric"
    )
    val profiling = Profiler.profile(df, tsColumn, builder, granularity)
    if (repo.getDataset(datasetUri).isEmpty) {
      val metrics = metricNames
      repo.registerDataset(
        DatasetMeta(
          uri = datasetUri,
          tsColumn = tsColumn,
          columns = df.columns.filterNot(_ == tsColumn).toSeq,
          granularity = granularity,
          metrics = metrics
        )
      )
    }
    repo.addProfiling(datasetUri, profiling)
    profiling
  }

  /** Optimize anomaly models for every metric series of a dataset from
    * its stored profiling history (reference `optimize`,
    * service_layer.py:232-291). Stores and returns
    * (entity, instance, name, best_model, threshold, mean_error).
    */
  def optimize(
      datasetUri: String,
      repo: MetricsRepository,
      cfg: Optimizer.Config = Optimizer.Config(),
      failOnError: Boolean = false
  ): DataFrame = {
    val history = baseProfiling(datasetUri, repo)
    val optimization = Optimizer
      .optimize(history, seriesCols, cfg = cfg)
      .select(
        (seriesCols.map(col) :+ col("best_model") :+ col("threshold") :+
          col("mean_error") :+ col("optimization_failed")): _*
      )
    // Strict mode mirrors the reference's OptimizationFailedError
    // (optimization.py:200-214); the default keeps the distributed
    // flag-don't-throw semantics. Only the (bounded) failed key set is
    // collected.
    if (failOnError) {
      val failed = optimization
        .where(col("optimization_failed"))
        .select(concat_ws("/", seriesCols.map(col): _*))
        .collect()
        .map(_.getString(0))
        .toSeq
      if (failed.nonEmpty)
        throw new graft.core.OptimizationFailedException(datasetUri, failed)
    }
    repo.addOptimization(datasetUri, optimization)
    optimization
  }

  /** Score the newest profiled point of every metric series against its
    * optimized model (reference `score`, service_layer.py:293-343).
    * Stores and returns (ts, entity, instance, name, value, predicted,
    * score).
    */
  def score(
      datasetUri: String,
      repo: MetricsRepository,
      cfg: Optimizer.Config = Optimizer.Config()
  ): DataFrame = {
    val history = baseProfiling(datasetUri, repo)
    val optimization = repo.getOptimization(datasetUri)
    // The reference raises when scoring an un-optimized dataset; an
    // empty inner join here would instead store nothing and let
    // assessQuality report healthy forever on an un-modeled dataset.
    if (optimization.isEmpty)
      throw new graft.core.UnoptimizedDatasetException(datasetUri)
    val scoring = Scorer
      .score(history, optimization, seriesCols, cfg = cfg)
      .select(
        (Seq(col("ts")) ++ seriesCols.map(col) ++ Seq(
          col("value"),
          col("predicted"),
          col("score")
        )): _*
      )
    repo.addScoring(datasetUri, scoring)
    scoring
  }

  /** Assessment outcome for one (dataset, ts): the anomalous subset
    * (empty = healthy).
    */
  case class Assessment(
      datasetUri: String,
      ts: java.sql.Timestamp,
      anomalous: Seq[AnomalousScore]
  ) {
    def isHealthy: Boolean = anomalous.isEmpty
  }

  /** Register a corpus-prepare batch's funnel losses as metric series
    * — the bridge between the pipeline and monitoring halves of this
    * library: each [[graft.pipelines.Corpus.prepareFunnel]] batch
    * becomes two series per stage (document count and share) under
    * entity "funnel", so the existing optimize / score / assessQuality
    * flow watches corpus preparation like any other dataset. "kept
    * share collapsed today" then alerts through the same notification
    * path as any data-quality anomaly.
    *
    * The share series is the health signal (scale-free — ingest volume
    * varies batch to batch); the count series carries the volume. A
    * stage with zero losses in a batch emits NO row for that ts (same
    * sparse semantics as profiling metrics; `Drift.missingDays` finds
    * gaps). One aggregation of the funnel's reason column — never a
    * rescan of the corpus.
    */
  def profileFunnel(
      funnel: DataFrame,
      datasetUri: String,
      ts: java.sql.Timestamp,
      repo: MetricsRepository,
      reasonCol: String = "drop_reason"
  ): DataFrame = {
    val stats = funnel.groupBy(col(reasonCol)).agg(count(lit(1)).as("_n"))
    val tot = stats.agg(sum("_n").as("_tot"))
    val rows = stats
      .crossJoin(broadcast(tot))
      .select(
        lit(ts).as("ts"),
        lit("funnel").as("entity"),
        col(reasonCol).cast("string").as("instance"),
        explode(
          array(
            struct(lit("n_docs").as("name"), col("_n").cast("double").as("value")),
            struct(
              lit("share").as("name"),
              (col("_n").cast("double") / col("_tot").cast("double")).as("value")
            )
          )
        ).as("_m")
      )
      .select(
        col("ts"),
        col("entity"),
        col("instance"),
        col("_m.name").as("name"),
        col("_m.value").as("value")
      )
    if (repo.getDataset(datasetUri).isEmpty) {
      repo.registerDataset(
        DatasetMeta(
          uri = datasetUri,
          tsColumn = "ts",
          columns = Seq(reasonCol),
          granularity = Granularity.Day,
          // instances are the data-dependent drop reasons — "*" marks
          // the per-reason fan-out in the registered metadata
          metrics = Seq(Metric("funnel", "*", "n_docs"), Metric("funnel", "*", "share"))
        )
      )
    }
    repo.addProfiling(datasetUri, rows)
    rows
  }

  /** Register an event stream's DAILY funnel conversion as metric
    * series — the product-analytics twin of [[profileFunnel]]: each
    * (day, step) becomes two series under entity "event_funnel"
    * (`users` volume; `share_of_entry` = step users / step-1 users,
    * the scale-free health signal), so a conversion-rate collapse
    * alerts through the same optimize / score / assessQuality path as
    * any data-quality anomaly. One funnel-walk aggregation over the
    * events — the day column comes from the data itself, so a single
    * call backfills the whole observed range.
    */
  def profileEventFunnel(
      events: DataFrame,
      datasetUri: String,
      repo: MetricsRepository,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"
  ): DataFrame = {
    val daily = graft.operators.EventAnalytics
      .funnelStepsDaily(events, userCol, typeCol, tsCol, steps)
    val byDay = Window
      .partitionBy(col("day"))
      .orderBy(col("step_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = daily
      // the metric NAME is the stored contract — share_of_entry must be
      // users / ENTRY-step users, not the lag-1 step-over-previous
      // conversion it briefly was (250/500 read as "25% of entrants"
      // when it meant "50% of the previous step")
      .withColumn("_entry_users", first(col("users")).over(byDay))
      .select(
        col("day").as("ts"),
        lit("event_funnel").as("entity"),
        col("step").as("instance"),
        explode(
          array(
            struct(
              lit("users").as("name"),
              col("users").cast("double").as("value")
            ),
            struct(
              lit("share_of_entry").as("name"),
              when(col("_entry_users") === 0, lit(0.0))
                .otherwise(col("users").cast("double") / col("_entry_users"))
                .as("value")
            )
          )
        ).as("_m")
      )
      .select(
        col("ts"),
        col("entity"),
        col("instance"),
        col("_m.name").as("name"),
        col("_m.value").as("value")
      )
    if (repo.getDataset(datasetUri).isEmpty) {
      repo.registerDataset(
        DatasetMeta(
          uri = datasetUri,
          tsColumn = tsCol,
          columns = Seq(typeCol),
          granularity = Granularity.Day,
          metrics = Seq(
            Metric("event_funnel", "*", "users"),
            Metric("event_funnel", "*", "share_of_entry")
          )
        )
      )
    }
    repo.addProfiling(datasetUri, rows)
    rows
  }

  /** Compare one timestamp's stored scores against optimized thresholds
    * and notify on exceedance (reference `assess_quality`,
    * service_layer.py:345-409 — which likewise assesses a single ts).
    * Defaults to the NEWEST scored ts; without the bound every past
    * anomaly would re-alert on every call. Only the anomalous subset
    * (bounded by the metric count of one dataset) is collected.
    */
  def assessQuality(
      datasetUri: String,
      repo: MetricsRepository,
      handlers: Seq[NotificationHandler] = Seq(LogHandler),
      ts: Option[java.sql.Timestamp] = None
  ): Assessment = {
    val scoringAll = repo.getScoring(datasetUri)
    val targetTs = ts.orElse(
      scoringAll.agg(max(col("ts"))).collect().headOption.flatMap(r => Option(r.getTimestamp(0)))
    )
    targetTs match {
      case None => Assessment(datasetUri, new java.sql.Timestamp(0L), Seq.empty)
      case Some(t) =>
        val scoring = scoringAll.where(col("ts") === lit(t))
        val optimization = repo.getOptimization(datasetUri)
        val assessed = Quality.assess(scoring, optimization, seriesCols)
        // Series whose optimization failed (null best_model) produce NO
        // scoring rows at all — Scorer's join on best_model drops them —
        // so an inner-join assessment would report the dataset healthy
        // while those metrics go unmonitored. The reference raises
        // OptimizationFailedError on this condition; here each FAILED
        // series with no score at the assessed ts alerts with a NaN
        // score instead of vanishing. Healthy series are deliberately
        // excluded: Scorer only scores the newest point per series, so
        // an anti-join over ALL optimized series would NaN-alert every
        // healthy series whenever a past ts is assessed.
        val unmonitored = optimization
          .where(col("optimization_failed") || col("best_model").isNull)
          .join(scoring.select(seriesCols.map(col): _*), seriesCols, "left_anti")
          .select(
            (seriesCols.map(col) ++ Seq(
              lit(Double.NaN).as("score"),
              coalesce(col("threshold"), lit(Double.NaN)).as("threshold")
            )): _*
          )
        val rows = assessed
          .where(col("is_anomalous"))
          .select(
            (seriesCols.map(col) ++ Seq(
              // unscorable (NULL) points alert with a NaN score; the
              // threshold coalesces too — a series scored under an
              // earlier optimization whose RE-optimize later failed
              // stores threshold NULL, and getDouble on it would NPE
              // the whole assessment instead of alerting
              coalesce(col("score"), lit(Double.NaN)).as("score"),
              coalesce(col("threshold"), lit(Double.NaN)).as("threshold")
            )): _*
          )
          .unionByName(unmonitored)
          .collect()
        val anomalous = rows.toSeq.map { r =>
          AnomalousScore(
            entity = r.getString(0),
            instance = r.getString(1),
            name = r.getString(2),
            score = r.getDouble(3),
            threshold = r.getDouble(4)
          )
        }
        val assessment = Assessment(datasetUri, t, anomalous)
        if (anomalous.nonEmpty) handlers.foreach(_.notify(datasetUri, t, anomalous))
        assessment
    }
  }

  /** Distribution-drift assessment over a raw batch: day-over-day PSI
    * per numeric column ([[graft.profiler.Drift.psiDrift]]), stored as
    * ordinary profiling metrics (entity="column", instance=col,
    * name="psi_drift") — so drift series flow through the SAME
    * repository, HtmlReport charts and history queries as every other
    * metric, no new surface — and alerted through the standard
    * notification handlers when psi exceeds `threshold` (0.25 = the
    * common "action" level).
    *
    * Returns the long-format psi metrics.
    *
    * Driver-side bound (the assessTrend contract): metric storage is a
    * distributed transform off ONE materialized snapshot — zero driver
    * rows at any |days| × |columns| — and only the alert subset is
    * collected, capped at `maxAlerts` rows (largest psi first,
    * deterministic tie-break). A truncated budget fires a synthetic
    * `_alert_budget/alerts_truncated` alert through the same handlers.
    */
  def assessDrift(
      df: DataFrame,
      datasetUri: String,
      tsColumn: String,
      repo: MetricsRepository,
      columns: Seq[String] = Seq.empty,
      bins: Int = 10,
      threshold: Double = 0.25,
      handlers: Seq[NotificationHandler] = Seq(LogHandler),
      maxAlerts: Int = 10000
  ): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    require(maxAlerts > 0, s"maxAlerts must be positive, got $maxAlerts")
    val targets =
      if (columns.nonEmpty) columns
      else
        df.schema.fields
          .filter(f => f.dataType.isInstanceOf[NumericType] && f.name != tsColumn)
          .map(_.name)
          .toSeq
    require(targets.nonEmpty, "assessDrift: no numeric columns to assess")
    // ONE evaluation: psi output is grain-level (|days| x |columns|
    // rows — a metric table, not data), materialized once so the
    // stored metrics and the alerts derive from that same snapshot.
    // Re-evaluating the lineage per consumer could let a concurrently-
    // appended source store one psi and alert on another.
    val psi = graft.functions.materialize(
      targets
        .map { c =>
          graft.profiler.Drift
            .psiDrift(df, tsColumn, c, bins)
            .select(
              col("ts"),
              lit("column").as("entity"),
              lit(c).as("instance"),
              lit("psi_drift").as("name"),
              col("psi").as("value")
            )
        }
        .reduce(_ unionByName _)
    )
    repo.addProfiling(datasetUri, psi)
    // alert PER DRIFTED DAY — an alert must name the day the
    // distribution moved, not the batch's newest day; only the
    // exceeding subset reaches the driver, one row past the budget to
    // detect truncation
    val capped = psi
      .where(col("value") > threshold)
      .orderBy(col("value").desc, col("instance"), col("ts"))
      .limit(maxAlerts + 1)
      .collect()
      .toSeq
    val truncated = capped.size > maxAlerts
    val kept = capped.take(maxAlerts)
    kept
      .groupBy(_.getTimestamp(0))
      .toSeq
      .sortBy(p => tsKey(p._1))
      .foreach { case (ts, dayRows) =>
        val alerts = dayRows.map { r =>
          AnomalousScore(
            entity = r.getString(1),
            instance = r.getString(2),
            name = r.getString(3),
            score = r.getDouble(4),
            threshold = threshold
          )
        }
        handlers.foreach(_.notify(datasetUri, ts, alerts))
      }
    if (truncated) {
      val totalExceeding = psi.where(col("value") > threshold).count()
      val newestTs = kept.map(_.getTimestamp(0)).maxBy(tsKey)
      handlers.foreach(
        _.notify(
          datasetUri,
          newestTs,
          Seq(
            AnomalousScore(
              entity = "_alert_budget",
              instance = datasetUri,
              name = "alerts_truncated",
              score = (totalExceeding - maxAlerts).toDouble,
              threshold = maxAlerts.toDouble
            )
          )
        )
      )
    }
    psi
  }

  /** Trend assessment over every stored metric series: tie-corrected
    * Mann-Kendall significance ([[graft.anomaly.StatTests.mannKendall]])
    * paired with the robust Theil-Sen slope — "this metric is
    * SIGNIFICANTLY drifting, at this rate". The forecast/threshold
    * chain catches points that break from history; this catches the
    * slow bleed that never breaks any single day.
    *
    * Per significant series (|z| > zThreshold): an alert through the
    * standard handlers (score = z, positive = rising, `thinned` set
    * when the statistic was computed on a thinned history), and a
    * `<name>_trend_z` metric stored at the series' newest ts — plus a
    * companion `<name>_trend_thinned` 0/1 series — so trend verdicts
    * AND their approximation provenance ride the same
    * repository/report/history surfaces. Returns the full per-series
    * verdict table (n, s, z, trend, thinned, slope).
    *
    * Driver-side bound: metric STORAGE is fully distributed (the
    * verdict table goes to the repository as a DataFrame transform —
    * zero driver rows at any series count); only the ALERT subset is
    * collected, capped at `maxAlerts` series (most significant by
    * \|z\| first, deterministic tie-break). At 10⁵ datasets × columns ×
    * metrics the old one-row-per-series collect was ~10⁶+ driver rows;
    * now the driver holds ≤ maxAlerts + 1. When the cap truncates, a
    * synthetic `_alert_budget/alerts_truncated` alert (score = dropped
    * count) fires through the same handlers — flagged, never silent.
    */
  def assessTrend(
      datasetUri: String,
      repo: MetricsRepository,
      zThreshold: Double = 1.96,
      handlers: Seq[NotificationHandler] = Seq(LogHandler),
      maxPoints: Int = 10000,
      maxAlerts: Int = 10000
  ): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    require(maxAlerts > 0, s"maxAlerts must be positive, got $maxAlerts")
    // Base series only: a stored `<name>_trend_z` series must never be
    // trend-tested itself (unbounded `_trend_z_trend_z` compounding).
    val hist = baseProfiling(datasetUri, repo)
    val mk =
      graft.anomaly.StatTests
        .mannKendall(hist, seriesCols, maxPoints = maxPoints)
    val slopes = graft.anomaly.Trend
      .theilSen(hist, seriesCols, maxPoints = maxPoints)
      .select((seriesCols.map(col) :+ col("slope")): _*)
    val newest = hist
      .groupBy(seriesCols.map(col): _*)
      .agg(max(col("ts")).as("_ts"))
    // materialized so the stored metrics, the alerts, and the returned
    // table all derive from ONE snapshot (the assessDrift contract)
    val verdicts = graft.functions.materialize(
      mk.join(slopes, seriesCols).join(newest, seriesCols)
    )
    // stored metrics as a distributed transform — two rows per series
    // (`<name>_trend_z` + the 0/1 thinned-provenance companion), never
    // collected
    val stored = verdicts
      .select(
        col("_ts").as("ts"),
        col("entity"),
        col("instance"),
        explode(
          array(
            struct(
              concat(col("name"), lit(trendSuffix)).as("name"),
              col("z").cast("double").as("value")
            ),
            struct(
              concat(col("name"), lit(trendThinnedSuffix)).as("name"),
              when(col("thinned"), 1.0).otherwise(0.0).as("value")
            )
          )
        ).as("_m")
      )
      .select(col("ts"), col("entity"), col("instance"),
        col("_m.name").as("name"), col("_m.value").as("value"))
    repo.addProfiling(datasetUri, stored)
    // alert subset only: significant series, most-significant first,
    // one row past the budget to detect truncation
    val capped = verdicts
      .where(abs(col("z")) > zThreshold)
      .orderBy(
        abs(col("z")).desc,
        col("entity"),
        col("instance"),
        col("name")
      )
      .limit(maxAlerts + 1)
      .collect()
      .toSeq
    val truncated = capped.size > maxAlerts
    val kept = capped.take(maxAlerts)
    kept
      .groupBy(_.getAs[java.sql.Timestamp]("_ts"))
      .toSeq
      .sortBy(p => tsKey(p._1))
      .foreach { case (ts, seriesRows) =>
        val alerts = seriesRows.map { r =>
          AnomalousScore(
            entity = r.getAs[String]("entity"),
            instance = r.getAs[String]("instance"),
            name = r.getAs[String]("name"),
            score = r.getAs[java.lang.Double]("z").doubleValue,
            threshold = zThreshold,
            thinned = r.getAs[Boolean]("thinned")
          )
        }
        handlers.foreach(_.notify(datasetUri, ts, alerts))
      }
    if (truncated) {
      // count what was cut so the budget breach itself alerts loudly
      val totalSignificant =
        verdicts.where(abs(col("z")) > zThreshold).count()
      val newestTs = kept
        .map(_.getAs[java.sql.Timestamp]("_ts"))
        .maxBy(tsKey)
      handlers.foreach(
        _.notify(
          datasetUri,
          newestTs,
          Seq(
            AnomalousScore(
              entity = "_alert_budget",
              instance = datasetUri,
              name = "alerts_truncated",
              score = (totalSignificant - maxAlerts).toDouble,
              threshold = maxAlerts.toDouble
            )
          )
        )
      )
    }
    verdicts.drop("_ts")
  }

  /** Embedding-space drift assessment: per-group centroid shift
    * between a reference snapshot and the current corpus
    * ([[graft.similarity.Similarity.centroidShift]]), stored as
    * ordinary profiling metrics (entity "embedding_group", metric
    * `centroid_shift`, instance = group key) at the observation
    * timestamp `ts` — so embedding drift rides the same repository,
    * report, and history surfaces as every scalar metric. Alerts fire
    * through the standard handlers when a group's shift exceeds
    * `threshold`, and ALWAYS for one-sided groups (appeared or
    * vanished — reported with score = +Infinity, since no finite
    * threshold should mute a domain disappearing from the corpus).
    *
    * The shift table is |groups| rows — collected once so the stored
    * metrics and the alerts derive from the same snapshot, same as
    * [[assessDrift]].
    */
  def assessEmbeddingDrift(
      reference: DataFrame,
      current: DataFrame,
      datasetUri: String,
      ts: java.sql.Timestamp,
      vecCol: String,
      keyCol: String,
      repo: MetricsRepository,
      threshold: Double = 0.25,
      handlers: Seq[NotificationHandler] = Seq(LogHandler)
  ): DataFrame = {
    val rows = graft.similarity.Similarity
      .centroidShift(reference, current, vecCol, keyCol)
      .select(
        lit(ts).as("ts"),
        lit("embedding_group").as("entity"),
        col("key").cast("string").as("instance"),
        lit("centroid_shift").as("name"),
        col("shift").as("value")
      )
      .collect()
      .toSeq
    val spark = reference.sparkSession
    val metrics = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("entity", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("instance", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)
      ))
    )
    repo.addProfiling(datasetUri, metrics)
    val alerts = rows.flatMap { r =>
      val shifted = !r.isNullAt(4) && r.getDouble(4) > threshold
      val oneSided = r.isNullAt(4)
      if (shifted || oneSided)
        Some(
          AnomalousScore(
            entity = r.getString(1),
            instance = r.getString(2),
            name = r.getString(3),
            score = if (oneSided) Double.PositiveInfinity else r.getDouble(4),
            threshold = threshold
          )
        )
      else None
    }
    if (alerts.nonEmpty) handlers.foreach(_.notify(datasetUri, ts, alerts))
    metrics
  }

  /** profile + optimize in one call (reference
    * `profile_create_optimize`, service_layer.py:411-459).
    */
  def profileCreateOptimize(
      df: DataFrame,
      datasetUri: String,
      tsColumn: String,
      repo: MetricsRepository,
      builder: ProfilingBuilder = ProfilingBuilder.default,
      granularity: String = Granularity.Day,
      cfg: Optimizer.Config = Optimizer.Config()
  ): DataFrame = {
    profileCreate(df, datasetUri, tsColumn, repo, builder, granularity)
    optimize(datasetUri, repo, cfg)
  }

  /** Full new-batch flow: profile the batch, score its newest point,
    * assess, notify (reference `assess_new_ts`,
    * service_layer.py:461-509).
    */
  def assessNewTs(
      df: DataFrame,
      datasetUri: String,
      tsColumn: String,
      repo: MetricsRepository,
      builder: ProfilingBuilder = ProfilingBuilder.default,
      granularity: String = Granularity.Day,
      cfg: Optimizer.Config = Optimizer.Config(),
      handlers: Seq[NotificationHandler] = Seq(LogHandler)
  ): Assessment = {
    profileCreate(df, datasetUri, tsColumn, repo, builder, granularity)
    score(datasetUri, repo, cfg)
    assessQuality(datasetUri, repo, handlers)
  }
}
