package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

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

  /** Media-file ingestion via the built-in `binaryFile` source — the
    * on-ramp for the multimodal plumbing (§2.7): a directory of
    * image/audio/video files becomes the opaque-binary frame the
    * decode kernels consume, WITHOUT interpreting a byte at read time.
    * Columns: `(doc_id = file path, payload, n_bytes, modified)`.
    *
    * `glob` prunes at the LISTING (e.g. `*.png` never reads the
    * sidecar .json files' bytes); `maxBytes` guards against a stray
    * multi-GB file OOMing an executor — the row is FILTERED with its
    * size intact in the listing, so set it to your executor budget
    * and alert on `spark.read` listing counts vs ingested counts.
    */
  def binaryCorpus(
      spark: SparkSession,
      path: String,
      glob: String = "*",
      maxBytes: Long = 512L * 1024 * 1024
  ): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .where(col("length") <= maxBytes)
      .select(
        col("path").as("doc_id"),
        col("content").as("payload"),
        col("length").as("n_bytes"),
        col("modificationTime").as("modified")
      )

  /** JSONL corpus ingest — the lingua franca of LLM training corpora
    * (one JSON document per line; Spark's text-based json source reads
    * .gz et al. transparently). PERMISSIVE parse with explicit
    * quarantine: a malformed line lands in `_corrupt_record` instead
    * of killing a 100 TB read, and the caller gets BOTH sides —
    * `(clean, quarantined)` — so loss is observable, never silent.
    * The id/text contract is checked at plan time on the clean side.
    *
    * Pass `schema` in production: inference is an extra full scan of
    * the corpus (fine at exploration scale, wrong at 100 TB). The
    * quarantine frame carries every parsed column (null for a corrupt
    * line) plus the raw line, so a triage query can group failures by
    * file or prefix.
    */
  def corpusJsonl(
      spark: SparkSession,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty
  ): (DataFrame, DataFrame) = {
    val base = schema.getOrElse(spark.read.options(options).json(path).schema)
    val withCorrupt = StructType(
      base.fields.filterNot(_.name == "_corrupt_record").toSeq :+
        StructField("_corrupt_record", StringType, nullable = true)
    )
    Seq(idCol, textCol).foreach(c =>
      require(
        withCorrupt.fieldNames.contains(c),
        s"corpus contract column '$c' not found in ${withCorrupt.fieldNames.mkString(", ")}"
      )
    )
    // text source + from_json rather than the json file source: the
    // parse is then an ordinary codegen'd expression, exempt from the
    // file-source rule that a query may not reference only the corrupt
    // column (which would forbid exactly the quarantine read), and the
    // raw line is available verbatim. Blank lines are skipped, as the
    // json source would.
    val parsed = spark.read
      .text(path)
      .where(length(trim(col("value"))) > 0)
      .select(
        from_json(
          col("value"),
          withCorrupt,
          options ++ Map(
            "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record"
          )
        ).as("j")
      )
    val clean =
      parsed.where(col("j._corrupt_record").isNull).select("j.*").drop("_corrupt_record")
    val quarantined = parsed.where(col("j._corrupt_record").isNotNull).select("j.*")
    (clean, quarantined)
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
