package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the zero-shuffle path for repeated
  * fact-fact joins at 100 TB.
  *
  * A shuffle join moves BOTH fact tables across the network every time
  * they meet. Writing each side bucketed (and sorted) by the join key
  * pre-shuffles them ONCE at write time: every subsequent join on that
  * key is a local sort-merge per bucket pair — no Exchange in the plan
  * (asserted in BucketedJoinSpec). This is the standard layout for a
  * lakehouse fact store where lineitem⋈orders-class joins run daily.
  */
object BucketedJoin {

  /** Persist `df` as a bucketed+sorted table (idempotent overwrite —
    * also clears an orphaned location left by a previous JVM, which a
    * fresh in-memory catalog would otherwise refuse to overwrite).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Hadoop-FS cleanup (works for local AND hdfs/s3a warehouse dirs —
    // java.io.File would silently skip remote schemes). The default
    // warehouse layout is <warehouse>/[<db>.db/]<table>: a qualified
    // "db.tbl" name maps to db.db/tbl, an unqualified one to the
    // CURRENT database (default db sits directly under the warehouse
    // root) — a plain <warehouse>/<name> would miss both, skip the
    // orphan, and saveAsTable would fail with LocationAlreadyExists.
    val parts = table.toLowerCase.split('.')
    val relPath = parts match {
      case Array(t) =>
        val db = spark.catalog.currentDatabase.toLowerCase
        if (db == "default") t else s"$db.db/$t"
      case Array(db, t) => if (db == "default") t else s"$db.db/$t"
      case _ =>
        throw new IllegalArgumentException(
          s"table must be 'name' or 'db.name', got '$table'")
    }
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      relPath
    )
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Inner-join two previously bucketed tables on their bucket keys.
    * With matching bucket counts Spark plans a shuffle-free SMJ.
    */
  def join(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String
  ): DataFrame = {
    // frame-qualified refs: unqualified col(k) === col(k) is ambiguous
    // when both tables use the same key name
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
