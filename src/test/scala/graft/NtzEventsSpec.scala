package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp-logical-type proofing for the ingest layer.
  *
  * Round 8 regression: the driver regenerated `events.parquet` with
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), Spark 4 read it as
  * TIMESTAMP_NTZ, and `q_sessionize`'s cast-to-long became an
  * AnalysisException. [[Tables.normalizeEventTime]] now owns the
  * encoding problem; this spec pins it — for EVERY registered query,
  * against a dataset dir whose events table is explicitly written as
  * TIMESTAMP_NTZ — so the next parquet-writer change fails here, not
  * in the correctness gate.
  */
class NtzEventsSpec extends AnyFunSuite with SparkSpec {

  private val realDir = "/root/testdata/sf0.001"

  /** A copy of sf0.001 where events.ts is REALLY TIMESTAMP_NTZ on disk
    * and every other table is symlinked unchanged.
    */
  private lazy val ntzDir: String = {
    val dir = Files.createTempDirectory("graft-ntz-sf").toFile
    dir.deleteOnExit()
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      Files.createSymbolicLink(
        Paths.get(dir.getPath, s"$n.parquet"),
        Paths.get(realDir, s"$n.parquet")
      )
    }
    Tables
      .events(spark, realDir)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write
      .parquet(s"${dir.getPath}/events.parquet")
    dir.getPath
  }

  test("normalizeEventTime maps NTZ to session-zone timestamp, value-preserving") {
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val norm = Tables.events(spark, ntzDir)
    assert(norm.schema("ts").dataType == TimestampType)
    // UTC session zone: the naive micros are reinterpreted 1:1, so the
    // epoch values must match the original table exactly.
    val a = Tables.events(spark, realDir).agg(sum(unix_timestamp(col("ts")))).head.getLong(0)
    val b = norm.agg(sum(unix_timestamp(col("ts")))).head.getLong(0)
    assert(a == b)
  }

  test("every registered query analyzes against an NTZ-written events table") {
    // Analysis is where the r8 break surfaced (DATATYPE_MISMATCH on
    // CAST(TIMESTAMP_NTZ AS BIGINT)); forcing it for the full registry
    // catches any query-side assumption the Tables normalization
    // doesn't cover. Build + .schema is cheap — nothing executes.
    val eventsConsumers = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, ntzDir)
        df.schema // force analysis
        if (df.inputFiles.exists(_.contains("events.parquet"))) Some(name) else None
    }
    // sanity: the discovery actually found the known events consumers
    assert(eventsConsumers.contains("q_sessionize"))
    assert(eventsConsumers.contains("profile_granularity_hour"))
    assert(eventsConsumers.size >= 10, s"suspiciously few events consumers: $eventsConsumers")
  }

  test("sessionize executes end-to-end on NTZ events with identical results") {
    val ntz = SparkEntry.queries("q_sessionize")(spark, ntzDir).collect()
    val ref = SparkEntry.queries("q_sessionize")(spark, realDir).collect()
    assert(ntz.nonEmpty)
    assert(ntz.toSeq == ref.toSeq)
  }
}
