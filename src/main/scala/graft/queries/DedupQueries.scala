package graft.queries

import graft.Tables
import graft.dedup.{Dedup, PortableDedup}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Deduplication queries (SURVEY §2.4) over `documents`/`embeddings`.
  *
  * The LSH/SimHash queries run the PORTABLE md5-derived signature
  * family ([[graft.dedup.PortableDedup]]), whose entire pipeline —
  * signatures, bands, candidate pairs, sweeps — a DuckDB oracle
  * reproduces exactly, so all four sit under the driver's hash-compare
  * gate. The XXH64 throughput family ([[graft.dedup.Dedup]]) computes
  * the same pipeline shapes with engine-native kernels and is covered
  * by ScalaTest exactness specs (DedupSpec) instead.
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

  // C4-style corpus-level segment dedup: 8-token windows, global
  // first occurrence by (doc_id, pos), docs rebuilt from survivors.
  // The md5 of the rebuilt text pins the EXACT surviving content and
  // order, not just counts.
  private val segmentDedupQ = {
    val w = 8
    Q(
      fn = (s, d) =>
        Dedup
          .segmentDedupSweep(Tables.documents(s, d), "text", "doc_id", segmentTokens = w)
          .orderBy("doc_id"),
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        segs AS (
          SELECT doc_id, i - 1 AS pos,
            array_to_string(list_slice(t, (i - 1) * $w + 1, i * $w), ' ') AS seg
          FROM toks, LATERAL unnest(
            generate_series(1, CAST(ceil(len(t) / CAST($w AS DOUBLE)) AS BIGINT))) AS u(i)),
        k AS (
          SELECT doc_id, pos, seg,
            ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
          FROM segs),
        reb AS (
          SELECT doc_id, COUNT(*) AS n_kept,
            string_agg(seg, ' ' ORDER BY pos) AS txt
          FROM k WHERE rn = 1 GROUP BY doc_id),
        ns AS (
          SELECT doc_id,
            CAST(ceil(len(t) / CAST($w AS DOUBLE)) AS BIGINT) AS n_segments
          FROM toks)
        SELECT ns.doc_id, ns.n_segments,
          COALESCE(reb.n_kept, 0) AS n_kept,
          md5(COALESCE(reb.txt, '')) AS text_hash
        FROM ns LEFT JOIN reb ON ns.doc_id = reb.doc_id
        ORDER BY ns.doc_id""")
    )
  }

  // Boilerplate stripping at 2% distinct-doc frequency; rebuilt-text
  // md5 pins exact surviving content + order.
  private val stripBoilerplateQ = {
    val w = 8
    val frac = 0.02
    Q(
      fn = (s, d) =>
        Dedup
          .stripBoilerplate(
            Tables.documents(s, d),
            "text",
            "doc_id",
            segmentTokens = w,
            minDocFrac = frac
          )
          .orderBy("doc_id"),
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        segs AS (
          SELECT doc_id, i - 1 AS pos,
            array_to_string(list_slice(t, (i - 1) * $w + 1, i * $w), ' ') AS seg
          FROM toks, LATERAL unnest(
            generate_series(1, CAST(ceil(len(t) / CAST($w AS DOUBLE)) AS BIGINT))) AS u(i)),
        n AS (SELECT COUNT(*) AS ndocs FROM documents),
        hot AS (
          SELECT seg FROM segs, n
          GROUP BY seg, ndocs
          HAVING COUNT(DISTINCT doc_id) >= $frac * ndocs),
        kept AS (
          SELECT doc_id, pos, seg FROM segs
          WHERE seg NOT IN (SELECT seg FROM hot)),
        reb AS (
          SELECT doc_id, COUNT(*) AS n_kept,
            string_agg(seg, ' ' ORDER BY pos) AS txt
          FROM kept GROUP BY doc_id),
        ns AS (
          SELECT doc_id,
            CAST(ceil(len(t) / CAST($w AS DOUBLE)) AS BIGINT) AS n_segments
          FROM toks)
        SELECT ns.doc_id, ns.n_segments,
          COALESCE(reb.n_kept, 0) AS n_kept,
          md5(COALESCE(reb.txt, '')) AS text_hash
        FROM ns LEFT JOIN reb ON ns.doc_id = reb.doc_id
        ORDER BY ns.doc_id""")
    )
  }

  // Quality-aware canonical election per exact-dup cluster: longest
  // copy wins, ties to lowest id.
  private val canonicalPickQ = Q(
    fn = (s, d) =>
      Dedup
        .canonicalPick(Tables.documents(s, d), "text", "doc_id", "n_chars")
        .orderBy("fingerprint"),
    oracle = Some("""
      WITH f AS (
        SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
          ' +', ' ', 'g'))) AS fingerprint, doc_id, n_chars
        FROM documents),
      r AS (
        SELECT fingerprint, doc_id,
          ROW_NUMBER() OVER (PARTITION BY fingerprint
            ORDER BY n_chars DESC, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY fingerprint) AS gs
        FROM f)
      SELECT fingerprint, doc_id AS canonical_id, gs AS group_size
      FROM r WHERE rn = 1 ORDER BY fingerprint""")
  )

  // ---- portable-minhash oracle CTE chain ------------------------------
  // Mirrors PortableDedup.minhashLshPairs step by step: shingles →
  // per-seed md5 minima → band buckets → bucket self-join → slot-
  // agreement Jaccard. `mp` = (id_a, id_b, jaccard). Emitted as WITH
  // RECURSIVE so the component query can extend the same chain with a
  // recursive reachability CTE.
  private def agreeSql(numHashes: Int): String =
    (1 to numHashes)
      .map(k => s"CASE WHEN sa[$k] = sb[$k] THEN 1 ELSE 0 END")
      .mkString(" + ")

  /** Shared CTE chain up to `banded` (doc_id, band, bucket, sig). */
  private def minhashBandedCte(shingleN: Int, numHashes: Int, bands: Int): String = {
    val r = numHashes / bands
    // 4 slots per digest — mirrors PortableDedup.minhashSignatures
    val slots = (0 until numHashes)
      .map(k => s"min(substr(md5('${k / 4}:' || shingle), ${(k % 4) * 8 + 1}, 8)) AS s$k")
      .mkString(", ")
    val sigList = (0 until numHashes).map(k => s"s$k").mkString("[", ", ", "]")
    val bandSelects = (0 until bands)
      .map { b =>
        val cat = (0 until r).map(j => s"s${b * r + j}").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cat)) AS bucket, $sigList AS sig FROM sig"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - ${shingleN - 2})) AS i
              FROM docs WHERE len(toks) >= $shingleN),
      sh AS (SELECT doc_id,
               array_to_string(list_slice(toks, i, i + ${shingleN - 1}), ' ') AS shingle
             FROM idx),
      sig AS (SELECT doc_id, $slots FROM sh GROUP BY doc_id),
      banded AS ($bandSelects)"""
  }

  private def minhashCte(shingleN: Int, numHashes: Int, bands: Int): String =
    s"""${minhashBandedCte(shingleN, numHashes, bands)},
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      mp AS (SELECT id_a, id_b, (${agreeSql(numHashes)}) / ${numHashes}.0 AS jaccard FROM cand)"""

  private val minhashQ = Q(
    fn = (s, d) =>
      PortableDedup
        .minhashLshPairs(Tables.documents(s, d), "text", "doc_id", threshold = 0.3)
        .orderBy("id_a", "id_b"),
    oracle = Some(s"""${minhashCte(3, 16, 4)}
      SELECT id_a, id_b, jaccard FROM mp WHERE jaccard >= 0.3 ORDER BY id_a, id_b""")
  )

  private val sweepQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup
        .nearDupSweep(
          docs,
          PortableDedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.5),
          "doc_id"
        )
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    oracle = Some(s"""${minhashCte(3, 16, 4)}
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT id_b FROM mp WHERE jaccard >= 0.5)
      ORDER BY doc_id""")
  )

  private val componentQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup
        .componentSweep(
          docs,
          PortableDedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.5),
          "doc_id"
        )
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    // min-label connected components as a recursive reachability CTE:
    // label(v) = min over all vertices reachable from v (incl. v)
    oracle = Some(s"""${minhashCte(3, 16, 4)},
      pr AS (SELECT id_a, id_b FROM mp WHERE jaccard >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                UNION SELECT id_b, id_a FROM pr),
      reach AS (SELECT src AS id, src AS r FROM edges
                UNION
                SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY id)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id <> label)
      ORDER BY doc_id""")
  )

  /** Decontamination: flag training-corpus docs near-duplicating a
    * benchmark/eval set. Benchmark side = doc_id % 20 == 0 (a stand-in
    * holdout); corpus side = the rest.
    */
  private val decontaminateQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      PortableDedup
        .crossMinhashPairs(
          docs.where(col("doc_id") % 20 === 0),
          docs.where(col("doc_id") % 20 =!= 0),
          "text",
          "doc_id",
          threshold = 0.5
        )
        .orderBy("id_l", "id_r")
    },
    oracle = Some(s"""${minhashBandedCte(3, 16, 4)},
      cand AS (SELECT DISTINCT a.doc_id AS id_l, b.doc_id AS id_r, a.sig AS sa, b.sig AS sb
        FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id % 20 = 0 AND b.doc_id % 20 <> 0),
      mp AS (SELECT id_l, id_r, (${agreeSql(16)}) / 16.0 AS jaccard FROM cand)
      SELECT id_l, id_r, jaccard FROM mp WHERE jaccard >= 0.5 ORDER BY id_l, id_r""")
  )

  // ---- portable-simhash oracle --------------------------------------
  // Mirrors PortableDedup.simhashPairs: 60-bit signature from md5
  // nibbles, pigeonhole chunking, chunk-join, popcount filter.
  private def simhashSql(maxHamming: Int): String = {
    val chunks = maxHamming + 1
    val bounds = (0 to chunks).map(c => c * 60 / chunks)
    val nibbles = (0 until 15)
      .map(p => s"(instr('0123456789abcdef', substr(h, ${p + 1}, 1)) - 1) AS n$p")
      .mkString(", ")
    val votes = (0 until 60)
      .map { j =>
        s"sum(CASE WHEN ((n${j / 4} >> ${j % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS v$j"
      }
      .mkString(", ")
    val sig = (0 until 60)
      .map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    val chunkSelects = (0 until chunks)
      .map { c =>
        val lo = bounds(c)
        val mask = (1L << (bounds(c + 1) - lo)) - 1
        s"SELECT doc_id, sig, $c AS chunk, (sig >> $lo) & $mask AS ck FROM sigs"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      th AS (SELECT doc_id, md5(tok) AS h FROM toks),
      nib AS (SELECT doc_id, $nibbles FROM th),
      votes AS (SELECT doc_id, $votes FROM nib GROUP BY doc_id),
      sigs AS (SELECT doc_id, CAST($sig AS BIGINT) AS sig FROM votes),
      ch AS ($chunkSelects),
      sp AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming)
      SELECT id_a, id_b, hamming FROM sp ORDER BY id_a, id_b"""
  }

  private val simhashQ = Q(
    fn = (s, d) =>
      PortableDedup
        .simhashPairs(Tables.documents(s, d), "text", "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b"),
    oracle = Some(simhashSql(3))
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

  // The XXH64 throughput family stays exercised by the driver as
  // rows-only checks through these two variants; exactness is asserted
  // in DedupSpec against plain-JVM recomputation of the kernels.
  private val minhashFastQ = Q(
    fn = (s, d) =>
      Dedup
        .minhashLshPairs(Tables.documents(s, d), "text", "doc_id", threshold = 0.3)
        .withColumn("jaccard", round6(col("jaccard")))
        .orderBy("id_a", "id_b"),
    oracle = None // XXH64 signatures — spec-covered (DedupSpec)
  )

  private val simhashFastQ = Q(
    fn = (s, d) =>
      Dedup
        .simhashPairs(Tables.documents(s, d), "text", "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b"),
    oracle = None // XXH64 signatures — spec-covered (DedupSpec)
  )

  // Cross-document duplicated 8-word spans (Lee-et-al-style substring
  // dedup, fixed-width approximation). Shuffle key = 16-byte md5 of
  // the span — identical in DuckDB, so fully oracle-gated.
  private val spanExactQ = Q(
    fn = (s, d) =>
      Dedup
        .duplicateSpans(
          Tables.documents(s, d),
          "text",
          "doc_id",
          spanWords = 8,
          minDocs = 2
        )
        .orderBy("span_hash"),
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      s AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS span
            FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)
            WHERE len(toks) >= 8)
      SELECT md5(span) AS span_hash,
        COUNT(DISTINCT doc_id) AS n_docs,
        COUNT(*) AS n_occurrences
      FROM s GROUP BY md5(span) HAVING COUNT(DISTINCT doc_id) >= 2
      ORDER BY span_hash""")
  )

  // Cross-source duplicate-overlap matrix: which source pairs share
  // 8-word spans, and how many doc pairs that induces — the
  // double-counting forensic before mixing sources. Fully oracle-gated
  // (md5 span family).
  private val sourceOverlapQ = Q(
    fn = (s, d) =>
      Dedup
        .sourceOverlapSpans(
          Tables.documents(s, d),
          "text",
          "doc_id",
          "source",
          spanWords = 8
        )
        .orderBy("source_a", "source_b"),
    oracle = Some("""
      WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                 FROM documents),
      s AS (SELECT source, doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS h
            FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)
            WHERE len(toks) >= 8),
      c AS (SELECT h, source, COUNT(DISTINCT doc_id) AS nd FROM s GROUP BY 1, 2)
      SELECT a.source AS source_a, b.source AS source_b,
        COUNT(*) AS shared_spans,
        CAST(SUM(a.nd * b.nd) AS BIGINT) AS cross_doc_pairs
      FROM c a JOIN c b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  // XXH64 span family: engine-specific hash kernel, so rows-only at
  // the driver gate; DedupSpec proves it groups identically to the
  // oracle-gated md5 family.
  private val spanFastQ = Q(
    fn = (s, d) =>
      Dedup
        .duplicateSpansFast(
          Tables.documents(s, d),
          "text",
          "doc_id",
          spanWords = 8,
          minDocs = 2
        )
        .orderBy("span_hash"),
    oracle = None
  )

  // Exact n-gram decontamination: benchmark = doc_id % 20 == 0 (same
  // split as the MinHash variant), 6-word spans, >= 2 shared.
  private val spanDecontaminateQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup
        .crossSpanOverlap(
          docs.where(col("doc_id") % 20 === 0),
          docs.where(col("doc_id") % 20 =!= 0),
          "text",
          "doc_id",
          spanWords = 6,
          minShared = 2
        )
        .orderBy("id_l", "id_r")
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sp AS (SELECT DISTINCT doc_id,
               md5(array_to_string(toks[i:i+5], ' ')) AS h
             FROM t, unnest(generate_series(1, len(toks) - 5)) AS u(i)
             WHERE len(toks) >= 6),
      bs AS (SELECT doc_id AS id_l, h FROM sp WHERE doc_id % 20 = 0),
      cs AS (SELECT doc_id AS id_r, h FROM sp WHERE doc_id % 20 <> 0),
      btot AS (SELECT id_l, COUNT(*) AS n_bench FROM bs GROUP BY 1),
      shared AS (SELECT id_l, id_r, COUNT(*) AS n_shared
                 FROM bs JOIN cs USING (h) GROUP BY 1, 2
                 HAVING COUNT(*) >= 2)
      SELECT s.id_l, s.id_r, s.n_shared,
        round(CAST(s.n_shared AS DOUBLE) / b.n_bench, 6) AS containment
      FROM shared s JOIN btot b USING (id_l)
      ORDER BY id_l, id_r""")
  )

  // Scored contamination: per-corpus-doc fraction of distinct 6-word
  // spans present anywhere in the benchmark slice (doc_id % 20 == 0).
  private val contaminationQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup
        .contaminationScore(
          docs.where(col("doc_id") % 20 === 0),
          docs.where(col("doc_id") % 20 =!= 0),
          "text",
          "doc_id",
          spanWords = 6
        )
        .orderBy("doc_id")
    },
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sp AS (SELECT DISTINCT doc_id,
               md5(array_to_string(toks[i:i+5], ' ')) AS h
             FROM t, unnest(generate_series(1, len(toks) - 5)) AS u(i)
             WHERE len(toks) >= 6),
      bs AS (SELECT DISTINCT h FROM sp WHERE doc_id % 20 = 0),
      cs AS (SELECT doc_id, h FROM sp WHERE doc_id % 20 <> 0),
      j AS (SELECT cs.doc_id, COUNT(*) AS n_spans,
              CAST(SUM(CASE WHEN bs.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_contaminated
            FROM cs LEFT JOIN bs ON cs.h = bs.h GROUP BY 1),
      d AS (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0)
      SELECT d.doc_id,
        coalesce(j.n_spans, 0) AS n_spans,
        coalesce(j.n_contaminated, 0) AS n_contaminated,
        round(CASE WHEN coalesce(j.n_spans, 0) > 0
          THEN CAST(j.n_contaminated AS DOUBLE) / j.n_spans
          ELSE 0.0 END, 6) AS contamination
      FROM d LEFT JOIN j USING (doc_id) ORDER BY doc_id""")
  )

  // Exact all-pairs Jaccard >= 0.5 via prefix filtering; the oracle is
  // the BRUTE-FORCE token-set join, so the hash compare proves the
  // prefix filter lossless on real data.
  // The key runs on the doc_id % 10 slice at threshold 0.9: the
  // synthetic corpus draws from a tiny vocabulary, so lower thresholds
  // emit hundreds of thousands of genuinely-similar pairs — correct,
  // but pointless to hash-compare wholesale.
  private val jaccardJoinQ = Q(
    fn = (s, d) =>
      Dedup
        .jaccardThresholdJoin(
          Tables.documents(s, d).where(col("doc_id") % 10 === 0),
          "text",
          "doc_id",
          0.9
        )
        .orderBy("id_a", "id_b"),
    oracle = Some("""
      WITH tk AS (SELECT doc_id, unnest(list_filter(list_distinct(string_split(text, ' ')),
                    t -> t <> '')) AS tok
                  FROM documents WHERE doc_id % 10 = 0),
      sz AS (SELECT doc_id, count(*) AS s FROM tk GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(count(*) AS BIGINT) AS n_intersection
                FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      j AS (SELECT id_a, id_b, n_intersection,
              CAST(n_intersection AS DOUBLE) /
                (sa.s + sb.s - n_intersection) AS jac
            FROM pairs
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b)
      SELECT id_a, id_b, n_intersection, round(jac, 6) AS jaccard
      FROM j WHERE jac >= 0.9 ORDER BY id_a, id_b""")
  )

  // Asymmetric containment join: probe docs >=90% token-contained in
  // a reference slice — quote/leakage detection where Jaccard misses
  // subsets (50-token quote in a 5000-token article: J~0.01, C=1.0).
  // Oracle is the brute-force token-intersection join. Same
  // transparent demo-slice convention as dedup_jaccard_join /
  // q_link_prediction: the synthetic corpus is ~90% literal-duplicate
  // clusters, so an unsliced probe emits every cross-cluster pair —
  // the 10%-probe slice keeps the demo priced like the operator, and
  // the identical predicate runs in the oracle
  private val containmentJoinQ = Q(
    fn = (s, d) =>
      Dedup
        .containmentJoin(
          Tables.documents(s, d).where(col("doc_id") % 10 === 3),
          Tables.documents(s, d).where(col("doc_id") % 5 === 0),
          "text",
          "doc_id",
          0.9
        )
        .orderBy("id_a", "id_b"),
    oracle = Some("""
      WITH pt AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                  FROM documents WHERE doc_id % 10 = 3),
      rt AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             FROM documents WHERE doc_id % 5 = 0),
      -- phantom '' tokens from consecutive spaces are not tokens
      ptf AS (SELECT * FROM pt WHERE tok <> ''),
      rtf AS (SELECT * FROM rt WHERE tok <> ''),
      sa AS (SELECT doc_id, count(*) AS s FROM ptf GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(count(*) AS BIGINT) AS n_intersection
                FROM ptf a JOIN rtf b ON a.tok = b.tok AND a.doc_id <> b.doc_id
                GROUP BY 1, 2),
      c AS (SELECT id_a, id_b, n_intersection,
              CAST(n_intersection AS DOUBLE) / sa.s AS cont
            FROM pairs JOIN sa ON sa.doc_id = id_a)
      SELECT id_a, id_b, n_intersection, round(cont, 6) AS containment
      FROM c WHERE cont >= 0.9 ORDER BY id_a, id_b""")
  )

  // duplication-shape planning view: pairs-tail vs boilerplate-cluster
  private val clusterSizesQ = Q(
    fn = (s, d) =>
      graft.dedup.Dedup
        .clusterSizeDistribution(Tables.documents(s, d), "text")
        .orderBy("cluster_size"),
    oracle = Some("""
      WITH c AS (SELECT text, count(*) AS sz FROM documents GROUP BY 1)
      SELECT sz AS cluster_size, count(*) AS n_clusters,
        CAST(SUM(sz) AS BIGINT) AS n_docs
      FROM c GROUP BY 1 ORDER BY cluster_size""")
  )

  val queries: Map[String, Q] = Map(
    "dedup_jaccard_join" -> jaccardJoinQ,
    "dedup_containment_join" -> containmentJoinQ,
    "dedup_contamination_score" -> contaminationQ,
    "dedup_span_exact" -> spanExactQ,
    "dedup_source_overlap" -> sourceOverlapQ,
    "dedup_span_exact_xxh64" -> spanFastQ,
    "dedup_decontaminate_exact" -> spanDecontaminateQ,
    "dedup_exact" -> exactQ,
    "dedup_cluster_sizes" -> clusterSizesQ,
    "dedup_near_sweep" -> sweepQ,
    "dedup_component_sweep" -> componentQ,
    "dedup_exact_normalized" -> exactNormQ,
    "dedup_segment_sweep" -> segmentDedupQ,
    "text_strip_boilerplate" -> stripBoilerplateQ,
    "dedup_canonical_pick" -> canonicalPickQ,
    "dedup_minhash_lsh" -> minhashQ,
    "dedup_decontaminate" -> decontaminateQ,
    "dedup_simhash" -> simhashQ,
    "dedup_minhash_lsh_xxh64" -> minhashFastQ,
    "dedup_simhash_xxh64" -> simhashFastQ,
    "dedup_embedding_cosine" -> embCosQ
  )
}
