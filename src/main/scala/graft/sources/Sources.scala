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

  /** One schema-contract violation (the Deequ-style schema check the
    * profiling reference leaves to callers).
    */
  case class SchemaViolation(column: String, kind: String, detail: String)

  class SchemaContractException(val violations: Seq[SchemaViolation])
      extends IllegalArgumentException(
        s"schema contract violated: ${violations.mkString("; ")}"
      )

  /** Diff a frame against an expected schema: `missing` (expected
    * column absent), `type_mismatch` (same name, different DataType —
    * nullability is NOT part of the contract), and, unless
    * `allowExtra`, `unexpected` (column the contract doesn't know).
    * Plan-time metadata only — no job runs.
    */
  def validateSchema(
      df: DataFrame,
      expected: StructType,
      allowExtra: Boolean = false
  ): Seq[SchemaViolation] = {
    // duplicate names first — a name->type Map would silently keep one
    // of them, hiding violations and making enforce's select ambiguous
    val dupes = df.schema
      .groupBy(_.name)
      .collect {
        case (n, fs) if fs.size > 1 =>
          SchemaViolation(n, "duplicate", fs.map(_.dataType.simpleString).mkString(" and "))
      }
      .toSeq
    val dupeNames = dupes.map(_.column).toSet
    val actual = df.schema
      .filterNot(f => dupeNames.contains(f.name))
      .map(f => f.name -> f.dataType)
      .toMap
    val missing = expected.filterNot(f => dupeNames.contains(f.name)).flatMap { f =>
      actual.get(f.name) match {
        case None =>
          Some(SchemaViolation(f.name, "missing", s"expected ${f.dataType.simpleString}"))
        case Some(dt) if dt != f.dataType =>
          Some(
            SchemaViolation(
              f.name,
              "type_mismatch",
              s"expected ${f.dataType.simpleString}, got ${dt.simpleString}"
            )
          )
        case _ => None
      }
    }
    val extras =
      if (allowExtra) Seq.empty
      else {
        val known = expected.map(_.name).toSet
        df.schema.collect {
          case f if !known.contains(f.name) && !dupeNames.contains(f.name) =>
            SchemaViolation(f.name, "unexpected", f.dataType.simpleString)
        }
      }
    dupes ++ missing ++ extras
  }

  /** Enforce the contract: throw a typed [[SchemaContractException]]
    * carrying EVERY violation (not just the first), or return the
    * frame projected to the contract's columns in contract order —
    * so downstream code can rely on position as well as name.
    */
  def enforceSchema(
      df: DataFrame,
      expected: StructType,
      allowExtra: Boolean = false
  ): DataFrame = {
    val violations = validateSchema(df, expected, allowExtra)
    if (violations.nonEmpty) throw new SchemaContractException(violations)
    df.select(expected.map(f => col(f.name)): _*)
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
