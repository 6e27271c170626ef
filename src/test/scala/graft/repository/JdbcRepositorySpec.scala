package graft.repository

import graft.SparkSpec
import graft.core.{DatasetMeta, Metric}
import org.apache.spark.sql.functions._

class JdbcRepositorySpec extends SparkSpec {
  import spark.implicits._

  private var dbSeq = 0
  private def newRepo(): JdbcMetricsRepository = {
    dbSeq += 1
    // embedded in-memory Derby — ships with Spark, no external service
    new JdbcMetricsRepository(spark, s"jdbc:derby:memory:graft_test_$dbSeq;create=true")
  }

  private val t1 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
  private val t2 = java.sql.Timestamp.valueOf("2025-01-02 00:00:00")

  test("dataset metadata round-trips, including nested metrics, last write wins") {
    val repo = newRepo()
    val m = Seq(Metric("Column", "a", "Mean"), Metric("Dataset", "*", "Size"))
    repo.registerDataset(DatasetMeta("u1", "ts", Seq("a"), "DAY", Seq.empty))
    repo.registerDataset(DatasetMeta("u1", "ts", Seq("a", "b"), "DAY", m))
    repo.registerDataset(DatasetMeta("u2", "ts", Seq.empty, "HOUR", Seq.empty))
    val got = repo.getDataset("u1").get
    assert(got.columns == Seq("a", "b") && got.metrics == m)
    assert(repo.getDataset("u2").get.columns.isEmpty)
    assert(repo.listDatasets().map(_.uri) == Seq("u1", "u2"))
    assert(repo.getDataset("ghost").isEmpty)
  }

  test("metrics with empty trailing fields survive the encode/decode round-trip") {
    // String.split drops trailing empty fields by default: a metric
    // with an empty name would decode to 2 fields and crash every
    // getDataset/listDatasets with AIOOBE
    val repo = newRepo()
    repo.registerDataset(DatasetMeta(
      uri = "jdbc://emptyfield",
      tsColumn = "ts",
      columns = Seq("a"),
      granularity = "day",
      metrics = Seq(Metric("Column", "a", ""))
    ))
    val back = repo.getDataset("jdbc://emptyfield")
    assert(back.nonEmpty && back.get.metrics == Seq(Metric("Column", "a", "")))
    assert(repo.listDatasets().exists(_.uri == "jdbc://emptyfield"))
  }

  test("profiling upsert replaces matching keys inside the database") {
    val repo = newRepo()
    val rows1 = Seq(
      (t1, "Column", "a", "Mean", Some(1.0)),
      (t1, "Column", "b", "Mean", Option.empty[Double])
    ).toDF("ts", "entity", "instance", "name", "value")
    val rows2 = Seq((t1, "Column", "a", "Mean", Some(2.0)))
      .toDF("ts", "entity", "instance", "name", "value")
    repo.addProfiling("u1", rows1)
    repo.addProfiling("u1", rows2)
    val got = repo.getProfiling("u1").orderBy("instance").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Double]("value") == 2.0, "key match replaced")
    assert(got(1).isNullAt(got(1).fieldIndex("value")), "null metric survives")
    // isolation between datasets
    repo.addProfiling("u2", rows1)
    assert(repo.getProfiling("u1").count() == 2)
    // ts bounds push into the database read
    assert(repo.getProfiling("u1", start = Some(t2)).count() == 0)
    assert(repo.getProfiling("u1", end = Some(t2)).count() == 2)
  }

  test("upsert replaces rows whose key column is NULL (null-safe match)") {
    // ts is part of the logical key; plain SQL equality never matches
    // NULL = NULL, so without the null-safe grammar a re-add would
    // accumulate duplicates instead of honoring latest-wins
    val repo = newRepo()
    val rows1 = Seq((Option.empty[java.sql.Timestamp], "Column", "a", "Mean", 1.0))
      .toDF("ts", "entity", "instance", "name", "value")
    val rows2 = Seq((Option.empty[java.sql.Timestamp], "Column", "a", "Mean", 2.0))
      .toDF("ts", "entity", "instance", "name", "value")
    repo.addProfiling("u1", rows1)
    repo.addProfiling("u1", rows2)
    val got = repo.getProfiling("u1").collect()
    assert(got.length == 1, "NULL-ts key replaced, not duplicated")
    assert(got.head.getAs[Double]("value") == 2.0)
  }

  test("reads push the dataset and ts predicates into the database") {
    val repo = newRepo()
    val rows = Seq((t1, "Column", "a", "Mean", 1.0))
      .toDF("ts", "entity", "instance", "name", "value")
    repo.addProfiling("u1", rows)
    // the docstring's claim, proven from the physical plan: the JDBC
    // scan carries PushedFilters for dataset_uri AND both ts bounds —
    // the selection runs where the (dataset_uri, ts) index lives
    val df = repo.getProfiling("u1", start = Some(t1), end = Some(t2))
    // default metadata truncation (100 chars) would cut the filter list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val scan =
      try df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
      finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(scan.contains("PushedFilters"), s"JDBC scan must push filters:\n$scan")
    assert(scan.contains("EqualTo(dataset_uri,u1)"), s"dataset predicate pushed:\n$scan")
    assert(scan.contains("GreaterThanOrEqual(ts,"), s"ts lower bound pushed:\n$scan")
    assert(scan.contains("LessThanOrEqual(ts,"), s"ts upper bound pushed:\n$scan")
  }

  test("optimization and scoring round-trip through the same staged upsert") {
    val repo = newRepo()
    val opt = Seq(("Column", "a", "Mean", "ewma", 0.2, 0.05, false))
      .toDF("entity", "instance", "name", "best_model", "threshold",
        "mean_error", "optimization_failed")
    repo.addOptimization("u1", opt)
    repo.addOptimization("u1", opt.withColumn("threshold", lit(0.3)))
    val o = repo.getOptimization("u1").collect()
    assert(o.length == 1 && o.head.getAs[Double]("threshold") == 0.3)

    val sc = Seq((t1, "Column", "a", "Mean", 1.0, 0.9, 0.11))
      .toDF("ts", "entity", "instance", "name", "value", "predicted", "score")
    repo.addScoring("u1", sc)
    val s = repo.getScoring("u1").collect()
    assert(s.length == 1 && s.head.getAs[Double]("score") == 0.11)
    assert(repo.getScoring("u1", start = Some(t2)).count() == 0)
  }

  test("the service pipelines run unchanged against the JDBC repository") {
    val repo = newRepo()
    // 10 days of a stable metric — profileCreate then optimize then
    // score, all through the trait; the swap is config, not code
    val rows = (1 to 10).map { d =>
      (java.sql.Timestamp.valueOf(f"2025-02-$d%02d 10:00:00"), 100.0 + (d % 2))
    }
    val df = rows.toDF("ts", "value")
    graft.service.Service.profileCreate(df, "ds://jdbc", "ts", repo)
    assert(repo.getProfiling("ds://jdbc").count() > 0)
    graft.service.Service.optimize("ds://jdbc", repo)
    assert(repo.getOptimization("ds://jdbc").count() > 0)
  }
}
