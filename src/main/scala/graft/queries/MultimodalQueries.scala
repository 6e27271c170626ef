package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing queries (SURVEY §2.7): the `documents` text is
  * re-encoded into an opaque binary payload to exercise the real
  * binary-column data flow (schema, size/hash metadata, batched kernel
  * shape). Feature extraction itself is covered by ScalaTest specs —
  * its mapPartitions kernel is not SQL-expressible.
  */
object MultimodalQueries extends QueryPack {

  private val binaryMetaQ = Q(
    fn = (s, d) =>
      Multimodal
        .withMeta(
          Tables
            .documents(s, d)
            .withColumn("payload", encode(col("text"), "UTF-8")),
          "payload",
          "text/plain"
        )
        .select(
          col("doc_id"),
          col("meta.media_type").as("media_type"),
          col("meta.n_bytes").as("n_bytes")
        )
        .orderBy("doc_id"),
    oracle = Some("""
      SELECT doc_id, 'text/plain' AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents ORDER BY doc_id""")
  )

  /** Frame sampling: number of sampled frames and total sampled bytes
    * per document — exercises the chunk/stride arithmetic end-to-end.
    * Byte-slicing semantics are engine-checkable in SQL.
    */
  private val frameSampleQ = Q(
    fn = (s, d) =>
      Multimodal
        .sampleFrames(
          Tables
            .documents(s, d)
            .withColumn("payload", encode(col("text"), "UTF-8")),
          "payload",
          frameBytes = 256,
          stride = 4
        )
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("sampled_bytes")
        )
        .orderBy("doc_id"),
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
          unnest(range(0, CAST(floor(octet_length(encode(text)) / 256.0) AS BIGINT), 4)) AS frame_idx
        FROM documents)
      SELECT doc_id, count(*) AS n_frames,
        CAST(SUM(least(256, nb - frame_idx * 256)) AS BIGINT) AS sampled_bytes
      FROM f GROUP BY doc_id ORDER BY doc_id""")
  )

  val queries: Map[String, Q] = Map(
    "multimodal_binary_meta" -> binaryMetaQ,
    "multimodal_frame_sample" -> frameSampleQ
  )
}
