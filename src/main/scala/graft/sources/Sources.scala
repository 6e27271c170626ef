package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Ingestion entry points: thin, schema-validated wrappers over
  * `spark.read` / `spark.readStream` so every pipeline starts from a
  * frame whose event-time column is known-good, plus the parquet sink
  * for streaming metric output.
  *
  * (The reference leaves reading entirely to the caller; these exist so
  * the profile/optimize/score pipelines can state their input contract
  * once.)
  */
object Sources {

  /** Batch read with event-time validation: `tsColumn` must exist and
    * be (castable to) timestamp. Fails fast at plan time, not mid-job.
    */
  def batch(
      spark: SparkSession,
      path: String,
      tsColumn: String,
      format: String = "parquet",
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val reader = spark.read.format(format).options(options)
    val df = schema.map(reader.schema).getOrElse(reader).load(path)
    require(
      df.columns.contains(tsColumn),
      s"Event-time column '$tsColumn' not found in ${df.columns.mkString(", ")}"
    )
    df.schema(tsColumn).dataType match {
      case TimestampType => df
      case _             => df.withColumn(tsColumn, col(tsColumn).cast(TimestampType))
    }
  }

  /** Streaming read (file source needs an explicit schema — Spark
    * refuses to infer on streams); same event-time contract as
    * [[batch]].
    */
  def stream(
      spark: SparkSession,
      path: String,
      tsColumn: String,
      schema: StructType,
      format: String = "parquet",
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val df = spark.readStream.format(format).options(options).schema(schema).load(path)
    require(
      df.columns.contains(tsColumn),
      s"Event-time column '$tsColumn' not found in ${df.columns.mkString(", ")}"
    )
    df.schema(tsColumn).dataType match {
      case TimestampType => df
      case _             => df.withColumn(tsColumn, col(tsColumn).cast(TimestampType))
    }
  }

  /** Start writing a (streaming) long-format metrics frame to parquet —
    * the streaming-profiler-to-repository sink. Append mode composes
    * with the watermarked windowed aggregation upstream.
    */
  def metricsSink(
      metrics: DataFrame,
      path: String,
      checkpointDir: String
  ): org.apache.spark.sql.streaming.StreamingQuery =
    metrics.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
