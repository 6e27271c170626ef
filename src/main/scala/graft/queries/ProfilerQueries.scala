package graft.queries

import graft.Tables
import graft.core.Granularity
import graft.profiler.{Analyzers, Profiler, ProfilingBuilder, TypeMapping}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Profiler queries (SURVEY §2.1) over the `events` table.
  *
  * Every query is ONE `groupBy(day)` pass regardless of the number of
  * days — contrast with the reference's job-per-timestamp loop
  * (thoth/profiler.py:313-336). Oracle SQL mirrors each metric as a
  * UNION ALL over the same day-truncated CTE.
  */
object ProfilerQueries extends QueryPack {

  private val numericCols = Seq("event_id", "user_id", "value")
  private val stringCols = Seq("event_type", "props")
  private val allCols = Seq("event_id", "user_id", "event_type", "value", "props")

  /** Long-format output, deterministically rounded + ordered. The
    * `+ 0.0` after rounding normalizes IEEE negative zero (a
    * near-zero-from-below skewness rounds to -0.0, which hash-compares
    * differently from +0.0); it is the identity for every other value.
    */
  private def finish(df: DataFrame): DataFrame =
    df.withColumn("value", round6(col("value")) + lit(0.0))
      .orderBy("ts", "entity", "instance", "name")

  /** One SELECT per (instance, name, sql expr), UNION ALL'd over the
    * day-truncated events CTE — the DuckDB mirror of a profile pass.
    */
  private def oracle(metrics: Seq[(String, String, String)], entity: String = "Column"): String = {
    val selects = metrics.map { case (instance, name, expr) =>
      val ent = if (instance == "*") "Dataset" else entity
      s"""SELECT ts, '$ent' AS entity, '$instance' AS instance, '$name' AS name,
         round($expr, 6) + 0 AS value FROM e GROUP BY ts"""
    }
    s"""WITH e AS (SELECT ${sqlDay("ts")} AS ts, event_id, user_id, event_type, value, props FROM events)
       ${selects.mkString("\nUNION ALL\n")}
       ORDER BY ts, entity, instance, name"""
  }

  private def builderOf(analyzers: Analyzers.type => Seq[graft.profiler.ColumnAnalyzer], numeric: Boolean) =
    new ProfilingBuilder(
      typeMappings = Seq(
        TypeMapping(
          t => if (numeric) t.isInstanceOf[NumericType] else t.isInstanceOf[StringType],
          analyzers(Analyzers)
        )
      ),
      datasetAnalyzers = Seq()
    )

  private val size = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          new ProfilingBuilder(Seq(), Seq(Analyzers.Size))
        )
      ),
    oracle = Some(oracle(Seq(("*", "Size", "CAST(COUNT(*) AS DOUBLE)"))))
  )

  private val completeness = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          new ProfilingBuilder(
            Seq(TypeMapping(_ => true, Seq(Analyzers.Completeness))),
            Seq()
          )
        )
      ),
    oracle = Some(
      oracle(allCols.map(c => (c, "Completeness", s"CAST(COUNT($c) AS DOUBLE) / COUNT(*)")))
    )
  )

  private val mean = Q(
    fn = (s, d) =>
      finish(Profiler.profile(Tables.events(s, d), "ts", builderOf(a => Seq(a.Mean), numeric = true))),
    oracle = Some(oracle(numericCols.map(c => (c, "Mean", s"AVG($c)"))))
  )

  /** Skew/kurtosis oracle mirrors the analyzer's raw-moment arithmetic
    * exactly (incl. v*sqrt(v) instead of pow — see Analyzers.Skewness).
    */
  private def skewSql(c: String): String = {
    val (m1, m2, m3) = (s"AVG(CAST($c AS DOUBLE))", s"AVG(CAST($c AS DOUBLE) * $c)", s"AVG(CAST($c AS DOUBLE) * $c * $c)")
    val v = s"($m2 - $m1 * $m1)"
    s"CASE WHEN $v > 0 THEN ($m3 - 3 * $m1 * $m2 + 2 * $m1 * $m1 * $m1) / ($v * sqrt($v)) END"
  }

  private def kurtSql(c: String): String = {
    val x = s"CAST($c AS DOUBLE)"
    val (m1, m2, m3, m4) =
      (s"AVG($x)", s"AVG($x * $c)", s"AVG($x * $c * $c)", s"AVG($x * $c * $c * $c)")
    val v = s"($m2 - $m1 * $m1)"
    s"""CASE WHEN $v > 0 THEN
        ($m4 - 4 * $m1 * $m3 + 6 * $m1 * $m1 * $m2 - 3 * $m1 * $m1 * $m1 * $m1) /
        ($v * $v) - 3 END"""
  }

  private val skewkurt = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(a => Seq(a.Skewness, a.Kurtosis), numeric = true)
        )
      ),
    oracle = Some(
      oracle(
        numericCols.map(c => (c, "Kurtosis", kurtSql(c))) ++
          numericCols.map(c => (c, "Skewness", skewSql(c)))
      )
    )
  )

  private val stddev = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(a => Seq(a.StandardDeviation), numeric = true)
        )
      ),
    oracle = Some(
      oracle(numericCols.map(c => (c, "StandardDeviation", s"STDDEV_SAMP($c)")))
    )
  )

  private val quantiles = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(
            a => a.Quantiles(Seq(0.25, 0.5, 0.75)),
            numeric = true
          )
        )
      ),
    oracle = Some(
      oracle(for {
        c <- numericCols
        q <- Seq(0.25, 0.5, 0.75)
      } yield (c, s"Quantile-$q", s"quantile_cont($c, $q)"))
    )
  )

  private val countDistinct = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(a => Seq(a.CountDistinct), numeric = false)
        )
      ),
    oracle = Some(
      oracle(stringCols.map(c => (c, "CountDistinct", s"CAST(COUNT(DISTINCT $c) AS DOUBLE)")))
    )
  )

  private val approxDistinct = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(a => Seq(a.ApproxCountDistinct()), numeric = false)
        )
      ),
    oracle = None // HLL sketch values are engine-specific
  )

  private val minmax = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(a => Seq(a.Min, a.Max, a.Sum), numeric = true)
        )
      ),
    oracle = Some(
      oracle(
        numericCols.flatMap(c =>
          Seq(
            (c, "Minimum", s"CAST(MIN($c) AS DOUBLE)"),
            (c, "Maximum", s"CAST(MAX($c) AS DOUBLE)"),
            (c, "Sum", s"CAST(SUM($c) AS DOUBLE)")
          )
        )
      )
    )
  )

  private val uniqueness = Q(
    fn = (s, d) =>
      Profiler
        .uniquenessProfile(Tables.events(s, d), "ts", "user_id")
        .withColumn("distinctness", round6(col("distinctness")))
        .withColumn("uniqueness", round6(col("uniqueness")))
        .orderBy("ts"),
    oracle = Some(s"""
      WITH c AS (
        SELECT ${sqlDay("ts")} AS ts, user_id, COUNT(*) AS cnt
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)
      SELECT ts, 'user_id' AS instance,
        round(COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 6) AS distinctness,
        round(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) / CAST(SUM(cnt) AS DOUBLE), 6) AS uniqueness
      FROM c GROUP BY ts ORDER BY ts""")
  )

  private val entropy = Q(
    fn = (s, d) =>
      Profiler
        .entropyProfile(Tables.events(s, d), "ts", "event_type")
        .withColumn("entropy", round6(col("entropy")))
        .orderBy("ts"),
    oracle = Some(s"""
      WITH c AS (
        SELECT ${sqlDay("ts")} AS ts, event_type, COUNT(*) AS cnt
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
      SELECT ts, 'event_type' AS instance,
        round(ln(CAST(SUM(cnt) AS DOUBLE))
          - SUM(cnt * ln(CAST(cnt AS DOUBLE))) / CAST(SUM(cnt) AS DOUBLE), 6) AS entropy
      FROM c GROUP BY ts ORDER BY ts""")
  )

  private val report = Q(
    fn = (s, d) => finish(Profiler.profile(Tables.events(s, d), "ts", ProfilingBuilder.default)),
    oracle = Some(
      oracle(
        numericCols.flatMap(c =>
          Seq(
            (c, "Mean", s"AVG($c)"),
            (c, "StandardDeviation", s"STDDEV_SAMP($c)"),
            (c, "Quantile-0.25", s"quantile_cont($c, 0.25)"),
            (c, "Quantile-0.5", s"quantile_cont($c, 0.5)"),
            (c, "Quantile-0.75", s"quantile_cont($c, 0.75)")
          )
        ) ++ allCols.map(c => (c, "Completeness", s"CAST(COUNT($c) AS DOUBLE) / COUNT(*)"))
          ++ stringCols.map(c => (c, "CountDistinct", s"CAST(COUNT(DISTINCT $c) AS DOUBLE)"))
          ++ Seq(("*", "Size", "CAST(COUNT(*) AS DOUBLE)"))
      )
    )
  )

  private val granularityHour = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(a => Seq(a.Mean), numeric = true),
          Granularity.Hour
        )
      ),
    oracle = Some(s"""
      WITH e AS (SELECT ${sqlTrunc("hour", "ts")} AS ts, event_id, user_id, value FROM events)
      ${numericCols
        .map(c => s"""SELECT ts, 'Column' AS entity, '$c' AS instance, 'Mean' AS name,
           round(AVG($c), 6) AS value FROM e GROUP BY ts""")
        .mkString("\nUNION ALL\n")}
      ORDER BY ts, entity, instance, name""")
  )

  /** WEEK/MONTH truncations: same single-pass shape as the hour query
    * (Spark and DuckDB both truncate weeks to Monday, months to the
    * 1st).
    */
  private def granularityQ(gran: String, unit: String) = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(a => Seq(a.Mean), numeric = true),
          gran
        )
      ),
    oracle = Some(s"""
      WITH e AS (SELECT ${sqlTrunc(unit, "ts")} AS ts, event_id, user_id, value FROM events)
      ${numericCols
        .map(c => s"""SELECT ts, 'Column' AS entity, '$c' AS instance, 'Mean' AS name,
           round(AVG($c), 6) AS value FROM e GROUP BY ts""")
        .mkString("\nUNION ALL\n")}
      ORDER BY ts, entity, instance, name""")
  )

  private val histogram = Q(
    fn = (s, d) =>
      Profiler
        .histogramProfile(Tables.events(s, d), "ts", "value", nBuckets = 10, min = 0.0, max = 500.0)
        .orderBy("ts", "bucket"),
    oracle = Some(s"""
      WITH e AS (SELECT ${sqlDay("ts")} AS ts, value FROM events WHERE value IS NOT NULL)
      SELECT ts, 'value' AS instance,
        least(greatest(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bucket,
        count(*) AS count
      FROM e GROUP BY ts, bucket ORDER BY ts, bucket""")
  )

  // Equi-depth twin of profile_histogram: quantile-boundary buckets,
  // exercised at day grain over the same skew-prone value column
  private val histogramEqDepth = Q(
    fn = (s, d) =>
      Profiler
        .equiDepthProfile(Tables.events(s, d), "ts", "value", nBuckets = 10)
        .orderBy("ts", "bucket"),
    oracle = Some(s"""
      WITH e AS (SELECT ${sqlDay("ts")} AS ts, value FROM events
                 WHERE value IS NOT NULL),
      b AS (SELECT ts, list_transform(quantile_cont(value,
              [${(0 to 10).map(j => j / 10.0).mkString(", ")}]),
              x -> round(x, 6)) AS bs
            FROM e GROUP BY ts),
      r AS (SELECT e.ts, e.value,
              len(list_filter(b.bs[2:10], x -> x <= e.value)) AS bucket
            FROM e JOIN b ON e.ts = b.ts),
      g AS (SELECT ts, bucket, count(*) AS count FROM r GROUP BY 1, 2)
      SELECT g.ts, 'value' AS instance, CAST(g.bucket AS BIGINT) AS bucket,
        b.bs[g.bucket + 1] AS lo,
        b.bs[g.bucket + 2] AS hi,
        count
      FROM g JOIN b ON g.ts = b.ts ORDER BY g.ts, bucket""")
  )

  // FD measurement over events: event_id -> user_id must HOLD (unique
  // ids), user_id -> event_type is heavily violated — one passing and
  // one failing dependency in the same report
  private val fdCheck = {
    val pairs = Seq(("event_id", "user_id"), ("user_id", "event_type"))
    def one(det: String, dep: String) = s"""
      SELECT '$det' AS determinant, '$dep' AS dependent,
        COUNT(*) AS n_groups,
        CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS violating_groups,
        CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
          AS violating_rows,
        MAX(nd) AS max_dependents,
        round(1.0 - SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) / SUM(n), 6)
          AS consistency
      FROM (SELECT $det, COUNT(DISTINCT $dep) AS nd, COUNT(*) AS n
            FROM events WHERE $det IS NOT NULL GROUP BY 1)"""
    Q(
      fn = (s, d) =>
        Profiler
          .functionalDependencyProfile(Tables.events(s, d), pairs)
          .orderBy("determinant", "dependent"),
      oracle = Some(
        pairs
          .map { case (det, dep) => one(det, dep) }
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY determinant, dependent")
      )
    )
  }

  // Key-skew pre-flight over events: user_id (high-cardinality, mild
  // skew) and event_type (a handful of hot values) in one report —
  // the "should I salt this shuffle key" signal before a job runs
  private val keySkewQ = {
    val keys = Seq("user_id", "event_type")
    val k = 10
    def one(c: String) = s"""
      SELECT '$c' AS key_column,
        CAST(s1 AS BIGINT) AS n_rows, n_keys, max_count,
        round(max_count / s1, 6) AS top1_share,
        round(topn / s1, 6) AS topk_share,
        round(ln(s1) - nlogn / s1, 6) AS entropy,
        round(sqrt(greatest(s2 / n_keys - (s1 / n_keys) * (s1 / n_keys),
          0.0)) / (s1 / n_keys), 6) AS cv
      FROM
        (SELECT SUM(n) AS s1, COUNT(*) AS n_keys, MAX(n) AS max_count,
          CAST(SUM(CAST(n AS HUGEINT) * n) AS DOUBLE) AS s2,
          SUM(n * ln(n)) AS nlogn
         FROM (SELECT COUNT(*) AS n FROM events GROUP BY $c)),
        (SELECT CAST(SUM(n) AS DOUBLE) AS topn FROM
          (SELECT COUNT(*) AS n FROM events GROUP BY $c
           ORDER BY n DESC LIMIT $k))"""
    Q(
      fn = (s, d) =>
        Profiler
          .keySkewProfile(Tables.events(s, d), keys, topK = k)
          .orderBy("key_column"),
      oracle = Some(
        keys.map(one).mkString(
          "SELECT * FROM (",
          " UNION ALL ",
          ") ORDER BY key_column"
        )
      )
    )
  }

  // Benford first-digit conformance of the value column per day; the
  // expected masses are interpolated into BOTH plans as literals so
  // no cross-engine log sits in the comparison
  private val benfordQ = {
    val pExp = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
    val caseExp = (1 to 9)
      .map(d => s"WHEN $d THEN ${pExp(d)}")
      .mkString("CASE digit ", " ", " END")
    Q(
      fn = (s, d) =>
        Profiler
          .benfordProfile(Tables.events(s, d), "ts", "value")
          .orderBy("ts", "digit"),
      oracle = Some(s"""
        WITH e AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts,
            regexp_extract(CAST(value AS VARCHAR), '[1-9]') AS dg
          FROM events WHERE value IS NOT NULL),
        c AS (SELECT ts, CAST(dg AS INT) AS digit, count(*) AS n
          FROM e WHERE dg <> '' GROUP BY 1, 2),
        spine AS (SELECT ts, unnest(range(1, 10)) AS digit
          FROM (SELECT DISTINCT ts FROM c)),
        f AS (SELECT spine.ts, CAST(spine.digit AS INT) AS digit,
            CAST(COALESCE(c.n, 0) AS BIGINT) AS n
          FROM spine LEFT JOIN c
            ON spine.ts = c.ts AND spine.digit = c.digit),
        t AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY ts) AS BIGINT)
            AS total FROM f),
        x AS (SELECT *, CAST($caseExp AS DOUBLE) AS pexp FROM t)
        SELECT ts, digit, n,
          round(n / total, 6) AS p_obs,
          round(pexp, 6) AS p_exp,
          round(SUM((n - total * pexp) * (n - total * pexp)
            / (total * pexp)) OVER (PARTITION BY ts), 6) AS chi2
        FROM x ORDER BY ts, digit""")
    )
  }

  // Identifier-integrity QA on event_id per day: missing ids in the
  // day's [min, max] span (dropped messages) + duplicates (replays)
  private val idIntegrityQ = Q(
    fn = (s, d) =>
      Profiler
        .idIntegrityProfile(Tables.events(s, d), "ts", "event_id")
        .orderBy("ts"),
    oracle = Some("""
      WITH a AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts,
          count(*) AS n, count(DISTINCT event_id) AS n_distinct,
          CAST(min(event_id) AS BIGINT) AS min_id,
          CAST(max(event_id) AS BIGINT) AS max_id
        FROM events WHERE event_id IS NOT NULL GROUP BY 1)
      SELECT ts, n, n_distinct, min_id, max_id,
        greatest(max_id - min_id + 1 - n_distinct, 0) AS missing,
        n - n_distinct AS duplicates,
        round(n_distinct / (max_id - min_id + 1.0), 6) AS density
      FROM a ORDER BY ts""")
  )

  // Snapshot diff as a regression test: snapshot B is derived from
  // lineitem in-plan (modulo-keyed removals / edits / additions), and
  // the ORACLE states the expected counts DIRECTLY from the modulo
  // conditions — the diff must reconstruct the planted edit script
  private val snapshotDiffQ = Q(
    fn = (s, d) => {
      // orders: o_orderkey is UNIQUE (the duplicate-key inflation the
      // docstring warns about is real — synthetic lineitem's
      // (orderkey, linenumber) is not a key)
      val a = Tables.orders(s, d)
      val removed = pmod(col("o_orderkey"), lit(97)) === 0
      val changed = pmod(col("o_orderkey"), lit(101)) === 0
      val bBase = a
        .where(!removed)
        .withColumn(
          "o_totalprice",
          when(changed, col("o_totalprice") + 1).otherwise(col("o_totalprice"))
        )
      val added = a
        .where(pmod(col("o_orderkey"), lit(197)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      graft.profiler.Drift.snapshotDiff(
        a,
        bBase.unionByName(added),
        Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderpriority")
      )
    },
    oracle = Some("""
      SELECT
        CAST(SUM(CASE WHEN o_orderkey % 197 = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_added,
        CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_removed,
        CAST(SUM(CASE WHEN o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
          THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        CAST(SUM(CASE WHEN o_orderkey % 97 <> 0 AND (o_orderkey % 101 <> 0)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      FROM orders""")
  )

  // Type inference over stringly-typed columns — the lineitem fields
  // re-encoded as strings (the schemaless-ingest scenario), then
  // inferred back; one column of genuine strings stays string
  private val typeInferQ = {
    val derive = Seq(
      "s_key" -> "CAST(l_orderkey AS STRING)",
      "s_qty" -> "CAST(l_quantity AS STRING)",
      "s_date" -> "CAST(l_shipdate AS STRING)",
      "s_flag" -> "l_returnflag",
      "s_bool" -> "CASE WHEN l_orderkey % 2 = 0 THEN 'true' ELSE 'false' END"
    )
    def one(c: String) = s"""
      SELECT '$c' AS "column", COUNT($c) AS n_nonnull,
        CASE WHEN COUNT($c) > 0
          THEN round(SUM(CASE WHEN regexp_matches($c, '^[+-]?[0-9]+$$')
            AND TRY_CAST($c AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END)
            / COUNT($c), 6) END AS frac_long,
        CASE WHEN COUNT($c) > 0
          THEN round(COUNT(TRY_CAST($c AS DOUBLE)) / COUNT($c), 6) END
          AS frac_double,
        CASE WHEN COUNT($c) > 0
          THEN round(SUM(CASE WHEN
            regexp_matches($c, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
            AND TRY_CAST($c AS TIMESTAMP) IS NOT NULL THEN 1 ELSE 0 END)
            / COUNT($c), 6) END AS frac_date,
        CASE WHEN COUNT($c) > 0
          THEN round(SUM(CASE WHEN lower($c) IN ('true','false')
            THEN 1 ELSE 0 END) / COUNT($c), 6) END AS frac_bool,
        CASE
          WHEN COUNT($c) > 0 AND SUM(CASE WHEN lower($c) IN
            ('true','false') THEN 1 ELSE 0 END) = COUNT($c) THEN 'boolean'
          WHEN COUNT($c) > 0 AND SUM(CASE WHEN
            regexp_matches($c, '^[+-]?[0-9]+$$')
            AND TRY_CAST($c AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END)
            = COUNT($c) THEN 'bigint'
          WHEN COUNT($c) > 0 AND COUNT(TRY_CAST($c AS DOUBLE)) = COUNT($c)
            THEN 'double'
          WHEN COUNT($c) > 0 AND SUM(CASE WHEN
            regexp_matches($c, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
            AND TRY_CAST($c AS TIMESTAMP) IS NOT NULL THEN 1 ELSE 0 END)
            = COUNT($c) THEN 'date'
          ELSE 'string' END AS inferred
      FROM d"""
    Q(
      fn = (s, d) => {
        val base = derive.foldLeft(Tables.lineitem(s, d)) {
          case (df, (n, sql)) => df.withColumn(n, expr(sql))
        }
        Profiler
          .typeInferenceProfile(base, derive.map(_._1))
          .orderBy("column")
      },
      oracle = Some(s"""
        WITH d AS (SELECT ${derive
          .map { case (n, sql) => s"$sql AS $n" }
          .mkString(", ")} FROM lineitem)
        SELECT * FROM (${derive.map(p => one(p._1)).mkString(" UNION ALL ")})
        ORDER BY "column"""")
    )
  }

  // HLL-priced population overlap between event types (which cohorts
  // share users) — estimates by design, accuracy spec-pinned
  private val overlapSketchQ = Q(
    fn = (s, d) =>
      Profiler
        .overlapSketchProfile(Tables.events(s, d), "user_id", "event_type")
        .orderBy("seg_a", "seg_b"),
    oracle = None // HLL estimates are engine-specific
  )

  // Daily user-novelty: distinct users, first-seen users, their
  // share, and the running distinct total — the crawl-freshness /
  // dedup-regression signal at ingest grain
  private val noveltyQ = Q(
    fn = (s, d) =>
      graft.profiler.Drift
        .noveltyProfile(Tables.events(s, d), "ts", "user_id")
        .orderBy("day"),
    oracle = Some(s"""
      WITH p AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)
          AS day, user_id
        FROM events WHERE user_id IS NOT NULL),
      pd AS (SELECT day, count(*) AS n_values FROM p GROUP BY 1),
      fs AS (SELECT day, count(*) AS n_new FROM
        (SELECT user_id, min(day) AS day FROM p GROUP BY 1) GROUP BY 1)
      SELECT pd.day, pd.n_values, COALESCE(fs.n_new, 0) AS n_new,
        round(COALESCE(fs.n_new, 0) / pd.n_values, 6) AS new_share,
        CAST(SUM(COALESCE(fs.n_new, 0)) OVER (ORDER BY pd.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_distinct
      FROM pd LEFT JOIN fs ON pd.day = fs.day ORDER BY pd.day""")
  )

  // Missingness-pattern profile. The synthetic events table has NO
  // nulls, so the query PLANTS a correlated missingness structure
  // in-plan from integer keys (a and b share the event_id%7 outage,
  // c is independent): phi(a,b) >> phi(a,c) in the report, and the
  // oracle re-derives the identical structure
  private val nullCorrQ = {
    val derive = Seq(
      "a" -> "CASE WHEN event_id % 7 >= 2 THEN value END",
      "b" -> "CASE WHEN event_id % 7 >= 1 AND user_id % 5 <> 0 THEN props END",
      "c" -> "CASE WHEN event_id % 2 = 0 THEN user_id END"
    )
    val pairSql = Seq(("a", "b", "nab"), ("a", "c", "nac"), ("b", "c", "nbc"))
      .map { case (x, y, both) =>
        s"""SELECT '$x' AS col_a, '$y' AS col_b, n,
           CAST(n$x AS BIGINT) AS n_a_null, CAST(n$y AS BIGINT) AS n_b_null,
           CAST($both AS BIGINT) AS n_both_null,
           round((CAST(n AS DOUBLE) * $both - CAST(n$x AS DOUBLE) * n$y) /
             sqrt(CAST(n$x AS DOUBLE) * (n - n$x) * n$y * (n - n$y)), 6)
             AS phi
           FROM s"""
      }
      .mkString(" UNION ALL ")
    Q(
      fn = (s, d) => {
        val e = Tables.events(s, d)
        val derived = derive.foldLeft(e) { case (df, (name, sql)) =>
          df.withColumn(name, expr(sql))
        }
        Profiler
          .nullCorrelationProfile(derived, Seq("a", "b", "c"))
          .orderBy("col_a", "col_b")
      },
      oracle = Some(s"""
        WITH d AS (SELECT ${derive
          .map { case (n, sql) => s"$sql AS $n" }
          .mkString(", ")} FROM events),
        s AS (SELECT count(*) AS n,
          SUM(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS na,
          SUM(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS nb,
          SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS nc,
          SUM(CASE WHEN a IS NULL AND b IS NULL THEN 1 ELSE 0 END) AS nab,
          SUM(CASE WHEN a IS NULL AND c IS NULL THEN 1 ELSE 0 END) AS nac,
          SUM(CASE WHEN b IS NULL AND c IS NULL THEN 1 ELSE 0 END) AS nbc
          FROM d)
        SELECT * FROM ($pairSql) ORDER BY col_a, col_b""")
    )
  }

  private val correlation = Q(
    fn = (s, d) =>
      Profiler
        .correlationProfile(Tables.events(s, d), "ts", numericCols)
        .withColumn("corr", round6(col("corr")))
        .orderBy("ts", "col_a", "col_b"),
    oracle = Some(s"""
      WITH e AS (SELECT ${sqlDay("ts")} AS ts, event_id, user_id, value FROM events)
      ${Seq(("event_id", "user_id"), ("event_id", "value"), ("user_id", "value"))
        .map { case (a, b) =>
          s"""SELECT ts, '$a' AS col_a, '$b' AS col_b, round(corr($a, $b), 6) AS corr
             FROM e GROUP BY ts"""
        }
        .mkString("\nUNION ALL\n")}
      ORDER BY ts, col_a, col_b""")
  )

  /** The 100 TB configuration: sketch-only analyzers (HLL, t-digest
    * percentiles) whose partial state is O(1) per (day, column).
    * Rows-only check (approx values legitimately differ from exact
    * oracles); the exact twin `profile_report` carries the value gate.
    */
  private val reportSketch = Q(
    fn = (s, d) => finish(Profiler.profile(Tables.events(s, d), "ts", ProfilingBuilder.sketch)),
    oracle = None
  )

  private val topkValues = Q(
    fn = (s, d) =>
      Profiler
        .topKValuesProfile(Tables.events(s, d), "ts", "event_type", k = 3)
        .orderBy("ts", "rank"),
    oracle = Some(s"""
      WITH c AS (
        SELECT ${sqlDay("ts")} AS ts, CAST(event_type AS VARCHAR) AS value_str,
          count(*) AS count
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY ts
              ORDER BY count DESC, value_str) AS rank FROM c)
      SELECT ts, 'event_type' AS instance, value_str, count, rank
      FROM r WHERE rank <= 3 ORDER BY ts, rank""")
  )

  private val outliers = Q(
    fn = (s, d) =>
      Profiler
        .outlierProfile(Tables.events(s, d), "ts", "value")
        .withColumn("lo", round6(col("lo")))
        .withColumn("hi", round6(col("hi")))
        .orderBy("ts"),
    oracle = Some(s"""
      WITH e AS (SELECT ${sqlDay("ts")} AS ts, value FROM events WHERE value IS NOT NULL),
      f AS (
        SELECT ts, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        FROM e GROUP BY ts),
      b AS (SELECT ts, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi FROM f)
      SELECT e.ts, 'value' AS instance, count(*) AS n,
        CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        round(any_value(lo), 6) AS lo, round(any_value(hi), 6) AS hi
      FROM e JOIN b ON e.ts = b.ts GROUP BY e.ts ORDER BY e.ts""")
  )

  private val winsorizeQ = Q(
    fn = (s, d) =>
      graft.profiler.Clean
        .winsorize(Tables.events(s, d), "value", Seq("event_type"), lo = 0.05, hi = 0.95)
        .select(
          col("event_id"),
          col("event_type"),
          col("value"),
          round6(col("value_winsorized")).as("value_winsorized")
        )
        .orderBy("event_id"),
    oracle = Some("""
      WITH b AS (
        SELECT event_type, quantile_cont(value, 0.05) AS lo,
          quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type)
      SELECT event_id, e.event_type, value,
        CASE WHEN value IS NULL THEN NULL
          ELSE round(least(greatest(value, lo), hi), 6) END AS value_winsorized
      FROM events e JOIN b ON e.event_type IS NOT DISTINCT FROM b.event_type
      ORDER BY event_id""")
  )

  // profiled once at DAY grain, rolled up to WEEK purely from the
  // stored partials — the raw table is scanned exactly once; the
  // oracle computes the weekly profile directly from raw, proving the
  // merge is exact (decimal sums), not approximate
  private val reaggQ = Q(
    fn = (s, d) => {
      val daily = graft.profiler.Moments
        .partials(Tables.events(s, d), "ts", Seq("value"), "day")
      graft.profiler.Moments
        .finalizeProfile(graft.profiler.Moments.reaggregate(daily, "week"))
        .orderBy("ts", "instance")
    },
    oracle = Some(s"""
      SELECT ${sqlTrunc("week", "ts")} AS ts, 'value' AS instance,
        COUNT(value) AS n,
        ${sqlRound6("CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / COUNT(value)")}
          AS mean,
        CASE WHEN COUNT(value) > 1 THEN
          ${sqlRound6(
        """sqrt(greatest(
             (CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
              - CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
                * CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) / COUNT(value))
             / (COUNT(value) - 1), 0.0))"""
      )}
        END AS stddev,
        min(value) AS min, max(value) AS max
      FROM events GROUP BY 1 ORDER BY 1, 2""")
  )

  // Weekly quantiles re-aggregated from persisted daily quantile-grid
  // partials — no raw rescan. Rows-only: the merged estimate is
  // sketch-valued (grid discretization + approx_percentile state), so
  // no engine-portable SQL reproduces it; the error bound vs an exact
  // recompute is spec-verified (MomentsSpec).
  private val reaggQuantilesQ = Q(
    fn = (s, d) => {
      val daily = graft.profiler.Moments
        .quantilePartials(Tables.events(s, d), "ts", Seq("value"), "day")
      graft.profiler.Moments
        .reaggregateQuantiles(daily, "week")
        .select(
          col("ts"),
          col("instance"),
          round6(col("q25")).as("q25"),
          round6(col("q50")).as("q50"),
          round6(col("q75")).as("q75")
        )
        .orderBy("ts", "instance")
    },
    oracle = None
  )

  // Daily HLL sketches rolled up to weekly distinct estimates — no raw
  // rescan, no exact-distinct Expand exchange. Rows-only (estimates);
  // MomentsSpec pins the estimate against exact weekly distincts.
  private val reaggDistinctQ = Q(
    fn = (s, d) => {
      val daily = graft.profiler.Moments
        .distinctPartials(Tables.events(s, d), "ts", Seq("user_id", "event_type"), "day")
      graft.profiler.Moments
        .reaggregateDistinct(daily, "week")
        .orderBy("ts", "instance")
    },
    oracle = None
  )

  // Day-over-day PSI drift of events.value: global-edge equi-width
  // bins, eps-clamped proportions, ln-based index. round6 masks libm
  // last-ulp ln differences between engines.
  private val psiDriftQ = Q(
    fn = (s, d) =>
      graft.profiler.Drift
        .psiDrift(Tables.events(s, d), "ts", "value", bins = 10, eps = 1e-6)
        .orderBy("ts"),
    oracle = Some(s"""
      WITH e AS (
        SELECT ${sqlDay("ts")} AS day, value FROM events
        WHERE value IS NOT NULL),
      g AS (SELECT min(value) AS mn, max(value) AS mx FROM e),
      b AS (SELECT day,
              CASE WHEN mx = mn THEN 0
                   ELSE least(CAST(floor((value - mn) / (mx - mn) * 10) AS INT), 9)
              END AS bin
            FROM e, g),
      c AS (SELECT day, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
      t AS (SELECT day, SUM(n) AS nt FROM c GROUP BY 1),
      grid AS (SELECT t.day, t.nt, u.i AS bin
               FROM t, unnest(generate_series(0, 9)) AS u(i)),
      p AS (SELECT grid.day, grid.bin,
              greatest(CAST(COALESCE(c.n, 0) AS DOUBLE) / grid.nt, 1e-6) AS p
            FROM grid LEFT JOIN c ON c.day = grid.day AND c.bin = grid.bin),
      pq AS (SELECT a.day, a.p, b.p AS q
             FROM p a JOIN p b
               ON b.day = a.day - INTERVAL 1 DAY AND b.bin = a.bin)
      SELECT day AS ts, round(SUM((p - q) * (ln(p) - ln(q))), 6) AS psi
      FROM pq GROUP BY day ORDER BY day""")
  )

  // Day-over-day two-sample KS statistic: per-(day, value) counts,
  // each day replayed as prev/cur side of its adjacent pairs, one
  // cumulative-sum window over distinct values per pair. Cum counts
  // are exact integers; the division + abs + max is identical IEEE
  // arithmetic in both engines; round6 guards the final ulp.
  private val ksDriftQ = Q(
    fn = (s, d) =>
      graft.profiler.Drift
        .ksDrift(Tables.events(s, d), "ts", "value")
        .orderBy("ts"),
    oracle = Some(s"""
      WITH e AS (
        SELECT ${sqlDay("ts")} AS day, value AS v FROM events
        WHERE value IS NOT NULL),
      c AS (SELECT day, v, COUNT(*) AS n FROM e GROUP BY 1, 2),
      m AS (
        SELECT day + INTERVAL 1 DAY AS pday, v, n AS na, 0 AS nb FROM c
        UNION ALL
        SELECT day AS pday, v, 0 AS na, n AS nb FROM c),
      g AS (SELECT pday, v, SUM(na) AS na, SUM(nb) AS nb FROM m GROUP BY 1, 2),
      t AS (SELECT pday, SUM(na) AS nat, SUM(nb) AS nbt FROM g GROUP BY 1
            HAVING SUM(na) > 0 AND SUM(nb) > 0),
      cum AS (
        SELECT g.pday, t.nat, t.nbt,
          SUM(g.na) OVER (PARTITION BY g.pday ORDER BY g.v) AS ca,
          SUM(g.nb) OVER (PARTITION BY g.pday ORDER BY g.v) AS cb
        FROM g JOIN t ON g.pday = t.pday)
      SELECT pday AS ts,
        round(MAX(ABS(CAST(ca AS DOUBLE) / nat - CAST(cb AS DOUBLE) / nbt)), 6) AS ks,
        CAST(MAX(nat) AS BIGINT) AS n_prev,
        CAST(MAX(nbt) AS BIGINT) AS n_cur
      FROM cum GROUP BY 1 ORDER BY ts""")
  )

  // LOCF gap-fill of per-user daily value sums: decimal day-sums
  // (order-independent, identical both engines), per-key spine,
  // last-non-null window fill.
  private val gapFillQ = Q(
    fn = (s, d) => {
      val daily = Tables
        .events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(decSum6(col("value")).as("value"))
      graft.profiler.Drift
        .gapFill(daily, "day", "value", Seq("user_id"))
        .orderBy("user_id", "day")
    },
    oracle = Some(s"""
      WITH s AS (
        SELECT user_id, ${sqlDay("ts")} AS d, ${sqlDecSum6("value")} AS v
        FROM events GROUP BY 1, 2),
      sp AS (SELECT user_id, min(d) AS mn, max(d) AS mx FROM s GROUP BY 1),
      spine AS (
        SELECT user_id, CAST(u.gd AS TIMESTAMP) AS d
        FROM sp, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS u(gd)),
      j AS (
        SELECT spine.user_id, spine.d, s.v
        FROM spine LEFT JOIN s ON s.user_id = spine.user_id AND s.d = spine.d)
      SELECT user_id, d AS day,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        v IS NULL AS filled
      FROM j ORDER BY user_id, day""")
  )

  // Silent-partition detector: calendar days with no events per user
  // within the dataset's global day span.
  private val missingDaysQ = Q(
    fn = (s, d) =>
      graft.profiler.Drift
        .missingDays(Tables.events(s, d), "ts", Seq("user_id"))
        .orderBy("user_id", "missing_day"),
    oracle = Some(s"""
      WITH o AS (
        SELECT DISTINCT user_id, ${sqlDay("ts")} AS d FROM events),
      span AS (SELECT min(d) AS mn, max(d) AS mx FROM o),
      keys AS (SELECT DISTINCT user_id FROM o),
      expected AS (
        SELECT user_id, CAST(u.gd AS TIMESTAMP) AS d
        FROM keys, span, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS u(gd))
      SELECT e.user_id, e.d AS missing_day
      FROM expected e LEFT JOIN o ON o.user_id = e.user_id AND o.d = e.d
      WHERE o.user_id IS NULL
      ORDER BY e.user_id, e.d""")
  )

  // Misra-Gries heavy hitters per day over event_type. k=10 exceeds
  // the 5-value domain, so the sketch runs in its exact regime —
  // estimates equal true counts and the DuckDB oracle can gate it.
  // The approximate regime (large domains, the 100 TB path) is
  // bound-verified in HeavyHittersSpec.
  private val heavyHittersQ = Q(
    fn = (s, d) =>
      Tables
        .events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("ts"))
        .agg(
          graft.profiler.HeavyHitters
            .sketch(10)(col("event_type"))
            .as("_hh")
        )
        .select(col("ts"), explode(col("_hh")).as(Seq("item", "est_count")))
        .orderBy("ts", "item"),
    oracle = Some(s"""
      SELECT ${sqlDay("ts")} AS ts, event_type AS item,
        COUNT(*) AS est_count
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  // Deequ Compliance: fraction of rows satisfying a row-level rule.
  // Registered as dataset analyzers (the predicate may span columns).
  private val complianceQ = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          new ProfilingBuilder(
            Seq(),
            Seq(
              Analyzers.Compliance("value_in_range", col("value").between(0, 100)),
              Analyzers
                .Compliance("engagement_type", col("event_type").isin("view", "click"))
            )
          )
        )
      ),
    oracle = Some(
      oracle(
        Seq(
          (
            "*",
            "Compliance(value_in_range)",
            "CAST(SUM(CASE WHEN value BETWEEN 0 AND 100 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"
          ),
          (
            "*",
            "Compliance(engagement_type)",
            "CAST(SUM(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"
          )
        )
      )
    )
  )

  // Deequ PatternMatch + MinLength/MaxLength over the string columns —
  // unanchored find semantics on both engines.
  private val propsPattern = "\"k\": [0-9]{2}"
  private val stringShapeQ = Q(
    fn = (s, d) =>
      finish(
        Profiler.profile(
          Tables.events(s, d),
          "ts",
          builderOf(
            a =>
              Seq(
                a.PatternMatch(propsPattern),
                a.MinLength,
                a.MaxLength
              ),
            numeric = false
          )
        )
      ),
    oracle = Some(
      oracle(
        stringCols.flatMap(c =>
          Seq(
            (
              c,
              s"PatternMatch($propsPattern)",
              s"CAST(SUM(CASE WHEN regexp_matches($c, '$propsPattern') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"
            ),
            (c, "MinLength", s"CAST(MIN(LENGTH($c)) AS DOUBLE)"),
            (c, "MaxLength", s"CAST(MAX(LENGTH($c)) AS DOUBLE)")
          )
        )
      )
    )
  )

  val queries: Map[String, Q] = Map(
    "profile_compliance" -> complianceQ,
    "profile_string_shape" -> stringShapeQ,
    "profile_heavy_hitters" -> heavyHittersQ,
    "profile_psi_drift" -> psiDriftQ,
    "profile_ks_drift" -> ksDriftQ,
    "profile_missing_days" -> missingDaysQ,
    "profile_gapfill" -> gapFillQ,
    "profile_reaggregate" -> reaggQ,
    "profile_reaggregate_quantiles" -> reaggQuantilesQ,
    "profile_reaggregate_distinct" -> reaggDistinctQ,
    "profile_size" -> size,
    "profile_report_sketch" -> reportSketch,
    "profile_topk_values" -> topkValues,
    "profile_outliers" -> outliers,
    "profile_winsorize" -> winsorizeQ,
    "profile_completeness" -> completeness,
    "profile_mean" -> mean,
    "profile_skewkurt" -> skewkurt,
    "profile_stddev" -> stddev,
    "profile_quantiles" -> quantiles,
    "profile_count_distinct" -> countDistinct,
    "profile_approx_distinct" -> approxDistinct,
    "profile_minmax" -> minmax,
    "profile_uniqueness" -> uniqueness,
    "profile_entropy" -> entropy,
    "profile_report" -> report,
    "profile_granularity_hour" -> granularityHour,
    "profile_granularity_week" -> granularityQ(Granularity.Week, "week"),
    "profile_granularity_month" -> granularityQ(Granularity.Month, "month"),
    "profile_histogram" -> histogram,
    "profile_histogram_eqdepth" -> histogramEqDepth,
    "profile_fd_check" -> fdCheck,
    "profile_key_skew" -> keySkewQ,
    "profile_null_correlation" -> nullCorrQ,
    "profile_novelty" -> noveltyQ,
    "profile_benford" -> benfordQ,
    "profile_overlap_sketch" -> overlapSketchQ,
    "profile_type_infer" -> typeInferQ,
    "profile_snapshot_diff" -> snapshotDiffQ,
    "profile_id_integrity" -> idIntegrityQ,
    "profile_correlation" -> correlation
  )
}
