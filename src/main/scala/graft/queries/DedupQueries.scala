package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Deduplication queries (SURVEY §2.4) over `documents`/`embeddings`.
  *
  * MinHash-LSH and SimHash signatures depend on engine hash functions
  * (xxhash64) that DuckDB cannot reproduce — those two are rows-only
  * checks; their correctness is covered by ScalaTest specs with
  * hand-built duplicate corpora.
  */
object DedupQueries extends QueryPack {

  private val exactQ = Q(
    fn = (s, d) =>
      Dedup
        .exact(Tables.documents(s, d), "text", "doc_id")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id"),
    oracle = Some("""
      SELECT doc_id, n_chars FROM documents
      WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
      ORDER BY doc_id""")
  )

  private val exactNormQ = Q(
    fn = (s, d) =>
      Dedup
        .exactNormalized(Tables.documents(s, d), "text", "doc_id")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id"),
    oracle = Some("""
      SELECT doc_id, n_chars FROM documents
      WHERE doc_id IN (
        SELECT min(doc_id) FROM documents
        GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
          ' +', ' ', 'g')))
      ORDER BY doc_id""")
  )

  private val minhashQ = Q(
    fn = (s, d) =>
      Dedup
        .minhashLshPairs(Tables.documents(s, d), "text", "doc_id", threshold = 0.3)
        .withColumn("jaccard", round6(col("jaccard")))
        .orderBy("id_a", "id_b"),
    oracle = None // engine-hash-dependent signatures
  )

  private val simhashQ = Q(
    fn = (s, d) =>
      Dedup
        .simhashPairs(Tables.documents(s, d), "text", "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b"),
    oracle = None // engine-hash-dependent signatures
  )

  private val embCosQ = Q(
    fn = (s, d) =>
      Similarity
        .cosinePairs(Tables.embeddings(s, d), "vec_id", "embedding", "label", 0.3)
        .orderBy("id_a", "id_b"),
    oracle = Some("""
      WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          round(
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
          6) AS sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id)
      SELECT id_a, id_b, sim FROM p WHERE sim >= 0.3 ORDER BY id_a, id_b""")
  )

  private val sweepQ = Q(
    fn = (s, d) =>
      Dedup
        .minhashDedup(Tables.documents(s, d), "text", "doc_id", threshold = 0.5)
        .select(col("doc_id"))
        .orderBy("doc_id"),
    oracle = None // pair generation is engine-hash-dependent
  )

  private val componentQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup
        .componentSweep(
          docs,
          Dedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.5),
          "doc_id"
        )
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    oracle = None // pair generation is engine-hash-dependent
  )

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> exactQ,
    "dedup_near_sweep" -> sweepQ,
    "dedup_component_sweep" -> componentQ,
    "dedup_exact_normalized" -> exactNormQ,
    "dedup_minhash_lsh" -> minhashQ,
    "dedup_simhash" -> simhashQ,
    "dedup_embedding_cosine" -> embCosQ
  )
}
