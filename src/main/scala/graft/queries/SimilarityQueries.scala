package graft.queries

import graft.Tables
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search queries (SURVEY §2.5) over `embeddings`. */
object SimilarityQueries extends QueryPack {

  private def cosOf(x: String, y: String): String = s"""
    list_sum(list_transform(range(1, len($x.embedding) + 1),
      i -> CAST($x.embedding[i] AS DOUBLE) * CAST($y.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, len($x.embedding) + 1),
         i -> CAST($x.embedding[i] AS DOUBLE) * CAST($x.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, len($y.embedding) + 1),
         i -> CAST($y.embedding[i] AS DOUBLE) * CAST($y.embedding[i] AS DOUBLE)))))"""

  private val cosSql = cosOf("q", "c")

  // zero-norm exclusion predicate, mirroring the Spark-side guard in
  // bruteForceTopK/pqTopK/rankWithinCells (cosine undefined on a zero
  // vector; Spark's NaN would rank first under desc)
  private def normPosSql(x: String): String =
    s"""list_sum(list_transform(range(1, len($x.embedding) + 1),
      i -> CAST($x.embedding[i] AS DOUBLE) * CAST($x.embedding[i] AS DOUBLE))) > 0"""

  private val bruteForce = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        .bruteForceTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    oracle = Some(s"""
      WITH sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round($cosSql, 6) AS sim
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 5 AND ${normPosSql("q")} AND ${normPosSql("c")}),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims)
      SELECT query_id, neighbor_id, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")
  )

  /** The unrolled greedy: step 1 picks max round6(λ·rel); each later
    * step scores every unselected candidate
    * `round6(λ·rel − (1−λ)·max sim to the selected set)` and picks the
    * per-query argmax (id tiebreak) — the exact choice sequence of
    * `MmrKernel.select`, so the composed rerank is hash-verified step
    * by step (same unrolled-CTE precedent as the k-core oracle).
    * λ literals print through Scala doubles on both sides
    * (1 − 0.7 = 0.30000000000000004 appears verbatim).
    */
  private def mmrSql(k: Int, m: Int, lam: Double): String = {
    val l = lam.toString
    val om = (1 - lam).toString
    val steps = (2 to k)
      .map { t =>
        s"""scored$t AS (
        SELECT c.query_id, c.neighbor_id, c.rel,
          round($l * c.rel - $om * (
            SELECT max(p.sim) FROM psim p
            JOIN sel${t - 1} s
              ON p.query_id = s.query_id AND p.idb = s.neighbor_id
            WHERE p.query_id = c.query_id AND p.ida = c.neighbor_id), 6)
            AS mmr_score
        FROM cand c LEFT JOIN sel${t - 1} x
          ON x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id
        WHERE x.neighbor_id IS NULL),
      p$t AS (
        SELECT query_id, neighbor_id, rel, mmr_score, $t AS rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY mmr_score DESC, neighbor_id) AS rn FROM scored$t)
        WHERE rn = 1),
      sel$t AS (SELECT query_id, neighbor_id FROM sel${t - 1}
        UNION ALL SELECT query_id, neighbor_id FROM p$t)"""
      }
      .mkString(",\n")
    val unions = (1 to k).map(t => s"SELECT * FROM p$t").mkString(" UNION ALL ")
    s"""
    WITH sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        round(${cosOf("q", "c")}, 6) AS sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5 AND ${normPosSql("q")} AND ${normPosSql("c")}),
    cand AS (
      SELECT query_id, neighbor_id, sim AS rel FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY sim DESC, neighbor_id) AS rn FROM sims)
      WHERE rn <= $m),
    cv AS (
      SELECT c.query_id, c.neighbor_id, e.embedding
      FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id),
    psim AS (
      SELECT a.query_id, a.neighbor_id AS ida, b.neighbor_id AS idb,
        round(${cosOf("a", "b")}, 6) AS sim
      FROM cv a JOIN cv b
        ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
    p1 AS (
      SELECT query_id, neighbor_id, rel, round($l * rel, 6) AS mmr_score,
        1 AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY round($l * rel, 6) DESC, neighbor_id) AS rn FROM cand)
      WHERE rn = 1),
    sel1 AS (SELECT query_id, neighbor_id FROM p1),
    $steps
    SELECT query_id, neighbor_id, rel, mmr_score, rank
    FROM ($unions) ORDER BY query_id, rank"""
  }

  private val mmr = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        .mmrTopK(
          emb.filter(col("vec_id") < 5),
          emb,
          "vec_id",
          "embedding",
          k = 5,
          candidates = 20
        )
        .orderBy("query_id", "rank")
    },
    oracle = Some(mmrSql(5, 20, 0.7))
  )

  private val lsh = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        // explicit dim (r15, VERDICT r14 item 7): the production caller
        // of an ANN index knows its embedding dim — passing it removes
        // the full-corpus max(size(vec)) aggregate the fallback runs at
        // PLAN time. The test corpus is dim-64 at every scale factor
        // (verified across sf0.001/0.01/0.1), so the resolved dim — and
        // therefore every bucket and result row — is identical.
        .lshTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 5,
          dim = Some(64))
        .orderBy("query_id", "rank")
    },
    oracle = None // bucket assignment depends on engine hash planes
  )

  private val ivf = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        .ivfTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    oracle = None // k-means cell assignment is not SQL-expressible
  )

  private val pq = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        .pqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 5,
          m = 8, ksub = 16, rerankFactor = 4)
        .orderBy("query_id", "rank")
    },
    oracle = None // k-means sub-codebook fit is not SQL-expressible
  )

  // Correctness anchor for the PQ machinery, same pattern as the
  // dedup_semantic_pairs nlist=1 anchor: with rerankFactor large
  // enough that the short list covers the whole corpus, the exact
  // rerank provably reproduces brute-force cosine top-k REGARDLESS of
  // what the fitted codebooks look like — so encode, ADC scoring,
  // short-listing and rerank all sit on the oracle path. The
  // production configuration (bounded short list) differs only in the
  // approximate cut; its recall is spec-pinned (AnnRecallSpec).
  private val pqExact = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      // saturation must hold at ANY plausible testdata regeneration:
      // the cut binds at k*rerankFactor = 1M candidates, ~500x the
      // sf0.1 embeddings table, and an unsaturated cut would make the
      // "exact" anchor quietly approximate (gate flake, not a clean
      // failure). The filter itself is free — rank <= N on the same
      // window either way.
      Similarity
        .pqTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 5,
          m = 8, ksub = 16, rerankFactor = 200000)
        .orderBy("query_id", "rank")
    },
    oracle = Some(s"""
      WITH sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round($cosSql, 6) AS sim
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 5 AND ${normPosSql("q")} AND ${normPosSql("c")}),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims)
      SELECT query_id, neighbor_id, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")
  )

  private val quantized = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        .quantizedTopK(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    oracle = Some("""
      WITH z AS (SELECT vec_id,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
        FROM embeddings),
      qv AS (SELECT e.vec_id,
          CASE WHEN s > 0
            THEN list_transform(e.embedding, x -> floor(CAST(x AS DOUBLE) / s + 0.5))
            ELSE list_transform(e.embedding, x -> 0.0) END AS q
        FROM embeddings e JOIN z ON e.vec_id = z.vec_id),
      sims AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
          round(
            list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * b.q[i]))
            / (sqrt(list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * a.q[i])))
             * sqrt(list_sum(list_transform(range(1, len(b.q) + 1), i -> b.q[i] * b.q[i])))),
          6) AS sim
        FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 5),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims)
      SELECT query_id, neighbor_id, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")
  )

  private val centroidQ = Q(
    fn = (s, d) =>
      Similarity
        .centroids(Tables.embeddings(s, d), "embedding", "label")
        .withColumnRenamed("key", "label")
        .orderBy("label", "pos"),
    oracle = Some("""
      WITH ex AS (
        SELECT label, unnest(generate_series(1, len(embedding))) AS i, embedding
        FROM embeddings),
      c AS (
        SELECT label, i - 1 AS pos,
          CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS s,
          COUNT(*) AS n
        FROM ex GROUP BY 1, 2)
      SELECT label, pos, round(s / n, 6) AS centroid, n
      FROM c ORDER BY label, pos""")
  )

  private val centroidCosineQ = Q(
    fn = (s, d) =>
      Similarity
        .centroidCosine(Tables.embeddings(s, d), "label", "vec_id", "embedding")
        .orderBy("vec_id"),
    oracle = Some("""
      WITH ex AS (
        SELECT label, unnest(generate_series(1, len(embedding))) AS i, embedding
        FROM embeddings),
      c AS (
        SELECT label, i AS pos,
          round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE)
            / COUNT(*), 6) AS centroid
        FROM ex GROUP BY 1, 2),
      ca AS (SELECT label, list(centroid ORDER BY pos) AS cv FROM c GROUP BY label)
      SELECT e.vec_id, e.label,
        CASE WHEN
          list_sum(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) > 0
          AND list_sum(list_transform(range(1, len(ca.cv) + 1),
            i -> ca.cv[i] * ca.cv[i])) > 0
        THEN round(
          list_sum(list_transform(range(1, len(e.embedding) + 1),
            i -> CAST(e.embedding[i] AS DOUBLE) * ca.cv[i]))
          / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, len(ca.cv) + 1),
               i -> ca.cv[i] * ca.cv[i])))), 6)
        END AS sim
      FROM embeddings e JOIN ca ON e.label = ca.label
      ORDER BY e.vec_id""")
  )

  // Correctness anchor for the semantic-dedup machinery: at nlist=1
  // the k-means blocking is trivial (every row in cell 0), so the
  // WHOLE pipeline — fit, NearestCells assignment, BucketJoin pairs,
  // cosine threshold — must reproduce plain all-pairs cosine, which
  // DuckDB recomputes exactly. The production path (nlist>1) differs
  // only in the blocking; its recall is spec-pinned.
  private val semanticPairsQ = Q(
    fn = (s, d) =>
      Similarity
        .semanticDedupPairs(
          Tables.embeddings(s, d).filter(col("vec_id") < 300),
          "vec_id",
          "embedding",
          threshold = 0.2,
          nlist = 1,
          bucketCap = 0
        )
        .orderBy("id_a", "id_b"),
    oracle = Some(s"""
      SELECT q.vec_id AS id_a, c.vec_id AS id_b, round($cosSql, 6) AS sim
      FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
      WHERE q.vec_id < 300 AND c.vec_id < 300
        AND round($cosSql, 6) >= 0.2
      ORDER BY id_a, id_b""")
  )

  // Embedding drift between two snapshots (vec_id parity split): the
  // DuckDB mirror recomputes both centroid sets with the same DECIMAL
  // means and the same 6-dp L2 rounding
  private val centroidShiftQ = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        .centroidShift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "embedding",
          "label"
        )
        .withColumnRenamed("key", "label")
        .orderBy("label")
    },
    oracle = Some("""
      WITH ex AS (
        SELECT vec_id, label,
          unnest(generate_series(1, len(embedding))) AS i, embedding
        FROM embeddings),
      ca AS (
        SELECT label, i - 1 AS pos,
          round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE)
                / COUNT(*), 6) AS c,
          COUNT(*) AS n
        FROM ex WHERE vec_id % 2 = 0 GROUP BY 1, 2),
      cb AS (
        SELECT label, i - 1 AS pos,
          round(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE)
                / COUNT(*), 6) AS c,
          COUNT(*) AS n
        FROM ex WHERE vec_id % 2 = 1 GROUP BY 1, 2)
      SELECT COALESCE(ca.label, cb.label) AS label,
        COUNT(*) AS dim,
        round(sqrt(SUM((ca.c - cb.c) * (ca.c - cb.c))), 6) AS shift,
        MAX(ca.n) AS n_a, MAX(cb.n) AS n_b
      FROM ca FULL OUTER JOIN cb ON ca.label = cb.label AND ca.pos = cb.pos
      GROUP BY 1 ORDER BY label""")
  )

  // Embedding-space decontamination: benchmark rows (vec_id < 5, the
  // same bounded bench set the ANN queries use) against the corpus at
  // cosine >= 0.2 — broadcast bench, one corpus scan, no window.
  private val embDecontaminateQ = Q(
    fn = (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity
        .crossCosineAbove(
          emb.filter(col("vec_id") < 5),
          emb,
          "vec_id",
          "embedding",
          0.2,
          // bench here IS a slice of the corpus (same id space), so a
          // same-id pair is a row against itself — exclude it.
          excludeSameId = true
        )
        .orderBy("id_bench", "id_corpus")
    },
    oracle = Some(s"""
      SELECT q.vec_id AS id_bench, c.vec_id AS id_corpus,
        round($cosSql, 6) AS sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5 AND round($cosSql, 6) >= 0.2
      ORDER BY id_bench, id_corpus""")
  )

  // SemDeDup semantic dedup sweep: k-means blocking + within-cell
  // cosine + connected components. Rows-only (cell assignment is the
  // fitted quantizer, not SQL-expressible — same declared design as
  // ann_ivf_topk); the planted-paraphrase-cluster spec carries the
  // correctness weight.
  private val semanticSweepQ = Q(
    fn = (s, d) =>
      Similarity
        .semanticDedupSweep(
          Tables.embeddings(s, d),
          "vec_id",
          "embedding",
          threshold = 0.5,
          nlist = 8,
          nAssign = 2
        )
        .select("vec_id", "label")
        .orderBy("vec_id"),
    oracle = None // k-means cell assignment is not SQL-expressible
  )

  // Exact distributed Lloyd's k-means (contrast the sampled driver fit
  // behind ann_ivf_topk, which is declared not-SQL-expressible): init
  // and every E/M round are deterministic, so the oracle unrolls the
  // two iterations as CTE pairs — same pattern as the PageRank oracle.
  // Distances use the dot identity on BOTH sides; centroid means go
  // through DECIMAL(38,10) and 6-dp rounding, so no FP noise survives
  // a round boundary.
  private val kmeansQ = {
    val k = 8
    val cc = "list_sum(list_transform(c.e, x -> x * x))"
    def dist(prev: String) = s"""
      SELECT n2.vec_id, c.cl,
        n2.vv - 2 * list_sum(list_transform(range(1, 65),
          i -> n2.e[i] * c.e[i])) + $cc AS dist
      FROM n2 CROSS JOIN $prev c"""
    def argmin(d: String) = s"""
      SELECT vec_id, cl, dist FROM (
        SELECT vec_id, cl, dist,
          row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
        FROM $d) WHERE rn = 1"""
    def iter(i: Int): String = s"""
      d$i AS (${dist(s"c${i - 1}")}),
      a$i AS (${argmin(s"d$i")}),
      ex$i AS (SELECT a.cl, unnest(generate_series(1, 64)) AS i, n2.e
        FROM a$i a JOIN n2 USING (vec_id)),
      m$i AS (SELECT cl, i - 1 AS pos,
          round(CAST(SUM(CAST(e[i] AS DECIMAL(38,10))) AS DOUBLE)
                / COUNT(*), 6) AS m
        FROM ex$i GROUP BY 1, 2),
      c$i AS (SELECT cl, list(m ORDER BY pos) AS e FROM m$i GROUP BY cl)"""
    Q(
      fn = (s, d) =>
        Similarity
          .kMeansAssign(Tables.embeddings(s, d), "vec_id", "embedding", k = k, iterations = 2)
          .orderBy("vec_id"),
      oracle = Some(s"""
        WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        n2 AS (
          SELECT vec_id, e, list_sum(list_transform(e, x -> x * x)) AS vv
          FROM v),
        c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e
          FROM v ORDER BY vec_id LIMIT $k),
        ${iter(1)},
        ${iter(2)},
        d3 AS (${dist("c2")})
        SELECT vec_id, cl AS cluster, round(dist, 6) AS dist
        FROM (${argmin("d3")}) ORDER BY vec_id""")
    )
  }

  // Exact covariance block over the first 8 dims — the distributed
  // half of PCA; the oracle re-derives every DECIMAL(38,12) running
  // sum so the whole one-pass wide aggregation is hash-gated
  private val covarianceQ = {
    val dims = 0 until 8
    def e(i: Int) = s"CAST(embedding[${i + 1}] AS DOUBLE)"
    val pairs = for { a <- dims; b <- dims if b >= a } yield (a, b)
    val sums = dims
      .map(i => s"CAST(SUM(CAST(${e(i)} AS DECIMAL(38,12))) AS DOUBLE) AS s$i")
      .mkString(",\n          ")
    val prods = pairs
      .map { case (a, b) =>
        s"CAST(SUM(CAST(${e(a)} * ${e(b)} AS DECIMAL(38,12))) AS DOUBLE) AS p${a}_$b"
      }
      .mkString(",\n          ")
    val selects = pairs
      .map { case (a, b) =>
        s"""SELECT $a AS i, $b AS j, n,
           round(p${a}_$b / n - (s$a / n) * (s$b / n), 6) AS cov FROM s"""
      }
      .mkString(" UNION ALL ")
    Q(
      fn = (sp, d) =>
        graft.similarity.Pca
          .covarianceBlock(Tables.embeddings(sp, d), "embedding", dims)
          .orderBy("i", "j"),
      oracle = Some(s"""
        WITH s AS (SELECT COUNT(*) AS n,
          $sums,
          $prods
          FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) > 7
            -- null-slot exclusion, mirroring covarianceBlock
            AND ${dims.map(i => s"${e(i)} IS NOT NULL").mkString(" AND ")})
        SELECT * FROM ($selects) ORDER BY i, j""")
    )
  }

  // e2e PCA path: covariance -> driver power iteration -> scan-side
  // projection; eigen math is not SQL-expressible, so the projection
  // gates rows-only here and the recovery quality is spec-pinned
  private val pcaProjectQ = Q(
    fn = (sp, d) => {
      val dims = 0 until 8
      val emb = Tables.embeddings(sp, d)
      val (axis, _) =
        graft.similarity.Pca.topComponent(
          graft.similarity.Pca.fitCovariance(emb, "embedding", dims)
        )
      graft.similarity.Pca
        .project(emb, "embedding", dims, axis)
        .select(col("vec_id"), col("pc1"))
        .orderBy("vec_id")
    },
    oracle = None // driver eigenvector is not SQL-expressible
  )

  // full whitening path: covariance fit -> driver Jacobi eigensolve ->
  // scan-side transform; identity-covariance quality is spec-pinned
  private val whitenQ = Q(
    fn = (sp, d) =>
      graft.similarity.Pca
        .whiten(Tables.embeddings(sp, d), "embedding", 0 until 8)
        .select(
          col("vec_id"),
          round6(element_at(col("whitened"), 1)).as("w0"),
          round6(element_at(col("whitened"), 8)).as("w7")
        )
        .orderBy("vec_id"),
    oracle = None // driver eigendecomposition is not SQL-expressible
  )

  val queries: Map[String, Q] = Map(
    "embed_covariance" -> covarianceQ,
    "embed_pca_project" -> pcaProjectQ,
    "embed_whiten" -> whitenQ,
    "embed_kmeans" -> kmeansQ,
    "embed_centroid" -> centroidQ,
    "embed_centroid_shift" -> centroidShiftQ,
    "dedup_semantic_sweep" -> semanticSweepQ,
    "dedup_semantic_pairs" -> semanticPairsQ,
    "ann_bruteforce_topk" -> bruteForce,
    "embed_centroid_cosine" -> centroidCosineQ,
    "similarity_mmr_topk" -> mmr,
    "ann_quantized_topk" -> quantized,
    "ann_lsh_topk" -> lsh,
    "ann_ivf_topk" -> ivf,
    "ann_pq_topk" -> pq,
    "ann_pq_topk_exact" -> pqExact,
    "dedup_embedding_decontaminate" -> embDecontaminateQ
  )
}
