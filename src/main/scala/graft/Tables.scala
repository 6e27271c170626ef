package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loader for the driver-provided TPC-H-ish test data. */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; read it as raw nanos and rebuild a micro-precision
    // timestamp below (truncation — matches DuckDB's ns→us handling).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTime(df, "ts") else df
  }

  /** Normalize an event-time column to session-zone TimestampType no
    * matter which parquet logical type the writer chose. The generator
    * has shipped both TIMESTAMP(NANOS) (read as raw long nanos under
    * nanosAsLong) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ by Spark 4) across regenerations; downstream
    * queries assume a plain TIMESTAMP they can cast to long. The
    * session timezone is UTC (LocalSession), so the NTZ→LTZ cast is
    * value-preserving and matches DuckDB's naive-timestamp reading.
    */
  def normalizeEventTime(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast("timestamp"))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  // NOTE on input parallelism: the driver ships each table as a
  // single-row-group parquet file (unsplittable — one scan task).
  // Spreading the scan here centrally was measured to HURT most keys
  // (an extra exchange per action; multi-action queries like the logit
  // fits re-pay it per job), so `functions.spread` is instead applied
  // INSIDE the operators whose scan-side kernels are heavy enough to
  // win from it (md5/xxh64 shingle pipelines, media decodes) — see
  // Dedup/PortableDedup/Multimodal. embeddings must NEVER be spread
  // before the IVF/PQ/semantic k-means fits: they collect() a training
  // sample whose ROW ORDER seeds the init and the FP accumulation
  // order — repartitioning would silently change those models.
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
