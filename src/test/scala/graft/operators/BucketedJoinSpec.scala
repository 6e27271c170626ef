package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without a shuffle and matches the shuffled join") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, d).select("o_orderkey", "o_orderpriority")
    BucketedJoin.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    BucketedJoin.writeBucketed(ord, "ord_bkt", "o_orderkey", 8)

    val joined = BucketedJoin.join(spark, "li_bkt", "ord_bkt", "l_orderkey", "o_orderkey")
    // disable broadcast so the co-location (not a broadcast) is what
    // removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan"
      )
      // and results match the plain shuffled join
      val expected = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val got = joined.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      graft.testing.DataFrameAssertions.assertDataFrameEquality(got, expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("writeBucketed cleans the db-qualified warehouse location on rewrite") {
    // the orphan location for 'db.tbl' is <warehouse>/db.db/tbl, not
    // <warehouse>/db.tbl — a mismatched cleanup path would skip the
    // orphan and the second write would die with LocationAlreadyExists
    val d = "/root/testdata/sf0.001"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt_db")
    try {
      val ord = Tables.orders(spark, d).select("o_orderkey", "o_orderpriority")
      // simulate the previous-JVM orphan: files at the real location
      // with no catalog entry
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(wh, "graft_bkt_db.db/ord_q")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(loc)
      val out = fs.create(new org.apache.hadoop.fs.Path(loc, "orphan.parquet"))
      out.write(1); out.close()
      // the write must clean the orphan and succeed
      BucketedJoin.writeBucketed(ord, "graft_bkt_db.ord_q", "o_orderkey", 4)
      assert(spark.table("graft_bkt_db.ord_q").count() == ord.count())
    } finally spark.sql("DROP DATABASE IF EXISTS graft_bkt_db CASCADE")
  }
}
