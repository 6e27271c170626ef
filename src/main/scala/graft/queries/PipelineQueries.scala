package graft.queries

import graft.Tables
import graft.pipelines.Corpus
import graft.text.Text
import org.apache.spark.sql.functions._

/** Corpus-preparation pipeline queries (SURVEY §2.6/§2.4 composition):
  * the chained funnel (rules -> language -> dedup) with first-failing
  * accounting, and deterministic domain-mixture sampling. Oracles
  * compose the already-gated per-stage SQL (gopher, langid,
  * fingerprint) so the CHAIN is hash-verified end to end, not just its
  * pieces.
  */
object PipelineQueries extends QueryPack {

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  // case-insensitive, mirroring Text.hitCount's lower(t) membership test
  private def swCountSql(lang: String): String =
    s"len(list_filter(string_split(text, ' '), t -> lower(t) IN ${inList(Text.stopwords(lang))}))"

  // shared funnel SQL: per-row first-failing drop reason, mirroring
  // Corpus.prepareFunnel stage for stage (gopher rules in evaluation
  // order, then the language gate, then canonical-slot dedup with
  // rule-failed rows ordered last). `where` restricts the input (the
  // incremental-batch oracle instantiates the chain per batch).
  private def funnelSql(where: String = ""): String = s"""
      WITH t AS (
        SELECT doc_id, n_chars,
          len(string_split(text, ' ')) AS n_words,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')) AS mwl,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
            / length(text) AS pr,
          ${swCountSql("en")} AS c_en, ${swCountSql("de")} AS c_de,
          ${swCountSql("fr")} AS c_fr, ${swCountSql("es")} AS c_es,
          md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
            ' +', ' ', 'g'))) AS fp
        FROM documents$where),
      g AS (SELECT *, greatest(c_en, c_de, c_fr, c_es) AS mx FROM t),
      p AS (SELECT doc_id, n_chars, fp,
        CASE WHEN c_en = mx AND mx > 0 THEN 'en'
             WHEN c_de = mx AND mx > 0 THEN 'de'
             WHEN c_fr = mx AND mx > 0 THEN 'fr'
             WHEN c_es = mx AND mx > 0 THEN 'es'
             ELSE 'und' END AS predicted,
        CASE WHEN n_words < 40 THEN 'too_short'
             WHEN n_words > 100000 THEN 'too_long'
             WHEN mwl < 3.0 OR mwl > 10.0 THEN 'word_len'
             WHEN pr > 0.1 THEN 'symbol_ratio'
             WHEN c_en < 2 THEN 'few_stopwords'
             ELSE NULL END AS g_reason
        FROM g),
      q AS (SELECT *, COALESCE(g_reason,
              CASE WHEN predicted <> 'en' THEN 'non_english' END) AS pre
            FROM p),
      r AS (SELECT *, row_number() OVER (PARTITION BY fp
              ORDER BY CASE WHEN pre IS NOT NULL THEN 1 ELSE 0 END, doc_id) AS rn
            FROM q),
      funnel AS (
        SELECT doc_id, n_chars, predicted, fp,
          COALESCE(pre, CASE WHEN rn > 1 THEN 'duplicate' END, 'kept') AS drop_reason,
          COALESCE(pre, CASE WHEN rn > 1 THEN 'duplicate' END) IS NULL AS kept
        FROM r)"""

  private val funnelQ = Q(
    fn = (s, d) =>
      Corpus
        .prepareFunnel(Tables.documents(s, d))
        .select("doc_id", "predicted", "drop_reason", "kept")
        .orderBy("doc_id"),
    oracle = Some(s"""
      ${funnelSql()}
      SELECT doc_id, predicted, drop_reason, kept FROM funnel ORDER BY doc_id""")
  )

  private val statsQ = Q(
    fn = (s, d) =>
      Corpus.funnelStats(
        Corpus.prepareFunnel(Tables.documents(s, d)),
        weightCol = Some("n_chars")
      ),
    oracle = Some(s"""
      ${funnelSql()}
      SELECT drop_reason, count(*) AS n_docs,
        CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS BIGINT) AS sum_n_chars
      FROM funnel
      GROUP BY drop_reason ORDER BY drop_reason""")
  )

  // funnel with the benchmark-decontamination stage: corpus = docs
  // outside the benchmark split, bench = every 20th doc (same split as
  // dedup_decontaminate_exact); span params small enough to fire at
  // sf0.01
  private val funnelDeconQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      Corpus
        .prepareFunnel(
          docs.where(col("doc_id") % 20 =!= 0),
          decontaminateAgainst = Some(docs.where(col("doc_id") % 20 === 0)),
          spanWords = 6,
          minShared = 2
        )
        .select("doc_id", "predicted", "drop_reason", "kept")
        .orderBy("doc_id")
    },
    oracle = Some(s"""
      WITH t AS (
        SELECT doc_id,
          len(string_split(text, ' ')) AS n_words,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')) AS mwl,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
            / length(text) AS pr,
          ${swCountSql("en")} AS c_en, ${swCountSql("de")} AS c_de,
          ${swCountSql("fr")} AS c_fr, ${swCountSql("es")} AS c_es,
          md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
            ' +', ' ', 'g'))) AS fp
        FROM documents WHERE doc_id % 20 <> 0),
      tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sp AS (SELECT DISTINCT doc_id, md5(array_to_string(toks[i:i+5], ' ')) AS h
             FROM tok, unnest(generate_series(1, len(toks) - 5)) AS u(i)
             WHERE len(toks) >= 6),
      shared AS (
        SELECT cs.doc_id
        FROM (SELECT doc_id AS bench_id, h FROM sp WHERE doc_id % 20 = 0) bs
        JOIN (SELECT doc_id, h FROM sp WHERE doc_id % 20 <> 0) cs ON bs.h = cs.h
        GROUP BY bs.bench_id, cs.doc_id HAVING COUNT(*) >= 2),
      contaminated AS (SELECT DISTINCT doc_id FROM shared),
      g AS (SELECT *, greatest(c_en, c_de, c_fr, c_es) AS mx FROM t),
      p AS (SELECT doc_id, fp,
        CASE WHEN c_en = mx AND mx > 0 THEN 'en'
             WHEN c_de = mx AND mx > 0 THEN 'de'
             WHEN c_fr = mx AND mx > 0 THEN 'fr'
             WHEN c_es = mx AND mx > 0 THEN 'es'
             ELSE 'und' END AS predicted,
        CASE WHEN n_words < 40 THEN 'too_short'
             WHEN n_words > 100000 THEN 'too_long'
             WHEN mwl < 3.0 OR mwl > 10.0 THEN 'word_len'
             WHEN pr > 0.1 THEN 'symbol_ratio'
             WHEN c_en < 2 THEN 'few_stopwords'
             ELSE NULL END AS g_reason
        FROM g),
      q AS (SELECT p.*, COALESCE(g_reason,
              CASE WHEN predicted <> 'en' THEN 'non_english' END,
              CASE WHEN c.doc_id IS NOT NULL THEN 'contaminated' END) AS pre
            FROM p LEFT OUTER JOIN contaminated c ON p.doc_id = c.doc_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY fp
              ORDER BY CASE WHEN pre IS NOT NULL THEN 1 ELSE 0 END, doc_id) AS rn
            FROM q)
      SELECT doc_id, predicted,
        COALESCE(pre, CASE WHEN rn > 1 THEN 'duplicate' END, 'kept') AS drop_reason,
        COALESCE(pre, CASE WHEN rn > 1 THEN 'duplicate' END) IS NULL AS kept
      FROM r ORDER BY doc_id""")
  )

  // incremental-prepare exact dedup (pipelines.Incremental semantics,
  // path-free): batch 1 = doc_id < 250, batch 2 = doc_id >= 200 — the
  // [200, 250) overlap models re-crawled content across days, so batch
  // 2's copies of batch-1-kept docs demote to duplicate_prior while
  // rule-failed rows keep their first-failing reason. Exercises
  // Incremental.demotePriorDuplicates, the exact plan prepareBatch runs.
  private val dedupPriorQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      val priorKept = Corpus
        .prepareFunnel(docs.where(col("doc_id") < 250), keepFpCol = Some("fp"))
        .where(col("kept"))
        .select(col("fp"))
      graft.pipelines.Incremental
        .demotePriorDuplicates(
          Corpus.prepareFunnel(docs.where(col("doc_id") >= 200), keepFpCol = Some("fp")),
          priorKept,
          fpCol = Some("fp")
        )
        .select("doc_id", "predicted", "drop_reason", "kept")
        .orderBy("doc_id")
    },
    oracle = Some(s"""
      WITH prior AS (
        SELECT fp FROM (
          ${funnelSql(" WHERE doc_id < 250")}
          SELECT fp FROM funnel WHERE kept)),
      b2 AS (
        SELECT doc_id, predicted, fp, drop_reason, kept FROM (
          ${funnelSql(" WHERE doc_id >= 200")}
          SELECT doc_id, predicted, fp, drop_reason, kept FROM funnel))
      SELECT b2.doc_id, b2.predicted,
        CASE WHEN b2.kept AND p.fp IS NOT NULL THEN 'duplicate_prior'
             ELSE b2.drop_reason END AS drop_reason,
        (b2.kept AND p.fp IS NULL) AS kept
      FROM b2 LEFT OUTER JOIN prior p ON b2.fp = p.fp
      ORDER BY b2.doc_id""")
  )

  // exact-binary-representable weights so the Scala literal and the
  // SQL decimal cast land on the identical double; budget 60 makes
  // src0 hit the f >= 1 keep-all branch at sf0.01 (25 docs/source)
  // while the other strata exercise the fractional threshold
  private val mixWeights =
    Seq("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125)
  private val mixBudget = 60L

  private val mixtureQ = Q(
    fn = (s, d) =>
      Corpus
        .mixtureSample(Tables.documents(s, d), "doc_id", "source", mixWeights, mixBudget)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
    oracle = Some {
      val (cte, pred) =
        Corpus.mixtureSampleSql("documents", "doc_id", "source", mixWeights, mixBudget)
      s"""
      WITH $cte
      SELECT d.doc_id, d.source
      FROM documents d JOIN _thr ON d.source = _thr._stratum
      WHERE $pred
      ORDER BY doc_id"""
    }
  )

  // temperature variant: shares derive from the data (w ∝ n^τ) instead
  // of a hand-written list; τ=0.5 visibly flattens the 20-source skew
  // and budget 150 keeps every stratum fractional at sf0.01
  private val mixtureTemperatureQ = Q(
    fn = (s, d) =>
      Corpus
        .mixtureTemperature(
          Tables.documents(s, d),
          "doc_id",
          "source",
          tau = 0.5,
          budget = 150L
        )
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
    oracle = Some {
      val (cte, pred) =
        Corpus.mixtureTemperatureSql("documents", "doc_id", "source", 0.5, 150L)
      s"""
      WITH $cte
      SELECT d.doc_id, d.source
      FROM documents d JOIN _thr ON d.source IS NOT DISTINCT FROM _thr._stratum
      WHERE $pred
      ORDER BY doc_id"""
    }
  )

  // weight-budgeted variant: budget in CHARACTERS (the token-budget
  // contract) against the n_chars column; 20000 puts src0 over the
  // f >= 1 keep-all cap at sf0.01 while the others stay fractional
  private val mixtureTokensQ = Q(
    fn = (s, d) =>
      Corpus
        .mixtureSampleByWeight(
          Tables.documents(s, d),
          "doc_id",
          "source",
          "n_chars",
          mixWeights,
          budget = 20000L
        )
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
    oracle = Some {
      val (cte, pred) = Corpus.mixtureSampleByWeightSql(
        "documents",
        "doc_id",
        "source",
        "n_chars",
        mixWeights,
        budget = 20000L
      )
      s"""
      WITH $cte
      SELECT d.doc_id, d.source, d.n_chars
      FROM documents d JOIN _thr ON d.source = _thr._stratum
      WHERE $pred
      ORDER BY doc_id"""
    }
  )

  // adaptive per-language quality cut: keep each language's top half
  // by the (6-dp-rounded) quality score; the threshold is an exact
  // in-plan percentile (Spark percentile == DuckDB quantile_cont)
  private val qualityCutQ = Q(
    fn = (s, d) => {
      val scored = Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          col("lang"),
          round6(Text.qualityScore(col("text"))).as("quality")
        )
      Corpus
        .qualityCut(scored, "quality", keepTop = 0.5, groupCols = Seq("lang"))
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id")
    },
    oracle = Some(s"""
      WITH t AS (
        SELECT doc_id, lang,
          CAST(${swCountSql("en")} AS DOUBLE) / len(string_split(text, ' ')) AS swr,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
            / length(text) AS pr,
          len(string_split(text, ' ')) AS ntok,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')) AS mwl
        FROM documents),
      sc AS (SELECT doc_id, lang, ${sqlRound6(
        """0.3 * swr + 0.2 * (1.0 - pr)
          + 0.3 * least(CAST(ntok AS DOUBLE) / 100.0, 1.0)
          + 0.2 * least(mwl / 8.0, 1.0)"""
      )} AS quality FROM t),
      thr AS (SELECT lang, quantile_cont(quality, 0.5) AS q FROM sc GROUP BY lang)
      SELECT sc.doc_id, sc.lang, sc.quality
      FROM sc JOIN thr ON sc.lang IS NOT DISTINCT FROM thr.lang
      WHERE sc.quality >= thr.q
      ORDER BY sc.doc_id""")
  )

  // shuffle-shard export coordinates: per-shard membership signature
  // (count + exact id sum), file fanout and ord-key range — the DuckDB
  // mirror recomputes the md5-cell arithmetic digit for digit, so
  // shard assignment is hash-verified engine-portable
  private val shuffleShardsQ = {
    val (nShards, filesPerShard, salt) = (8, 4, "shards")
    Q(
      fn = (s, d) =>
        graft.pipelines.Export
          .shuffleShards(Tables.documents(s, d), "doc_id", nShards, filesPerShard, salt)
          .groupBy("shard")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("doc_id").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("long")
              .as("id_sum"),
            countDistinct(col("file_no")).as("n_files"),
            min(col("ord")).as("first_ord"),
            max(col("ord")).as("last_ord")
          )
          .orderBy("shard"),
      oracle = Some(s"""
        WITH s AS (SELECT doc_id,
            md5(CAST(doc_id AS VARCHAR) || ':$salt') AS h FROM documents),
        t AS (SELECT doc_id,
            ${graft.pipelines.Export.cellSql("h", 1, nShards)} AS shard,
            ${graft.pipelines.Export.cellSql("h", 25, filesPerShard)} AS file_no,
            substr(h, 9, 16) AS ord
          FROM s)
        SELECT shard, COUNT(*) AS n_docs,
          CAST(SUM(CAST(doc_id AS DECIMAL(38,0))) AS BIGINT) AS id_sum,
          COUNT(DISTINCT file_no) AS n_files,
          MIN(ord) AS first_ord, MAX(ord) AS last_ord
        FROM t GROUP BY shard ORDER BY shard""")
    )
  }

  // Per-domain document cap: no source may contribute more than k docs,
  // keeping the largest (n_chars desc, doc_id tiebreak) — bounded-heap
  // selection, O(sources × k) shuffled state.
  private val sourceCapQ = Q(
    fn = (s, d) =>
      graft.operators.Sampling
        .capPerGroup(
          Tables.documents(s, d),
          Seq("source"),
          "doc_id",
          org.apache.spark.sql.functions.col("n_chars").cast("double"),
          k = 10
        )
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id"),
    oracle = Some("""
      SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
      WHERE rn <= 10 ORDER BY doc_id""")
  )

  /** DSIR importance resample end to end: hashed-bigram log-weights
    * (target = English inside the pool; the identical SQL the
    * `text_dsir_logweight` oracle is gated on) + Gumbel-max top-k —
    * the k=100 docs whose `log_weight + Gumbel(0,1)` keys win, a
    * weight-proportional sample without replacement whose membership
    * is a pure function of (doc_id, salt). The oracle recomputes the
    * md5 Gumbel draw digit by digit, so the COMPOSED pipeline
    * (features → smoothed log-ratio → resample) is hash-verified, not
    * just its stages.
    */
  private val dsirSampleQ = Q(
    fn = (s, d) =>
      graft.operators.Sampling
        .gumbelTopK(
          Text
            .dsirLogWeights(
              Tables.documents(s, d),
              "text",
              "doc_id",
              isTarget = col("lang") === "en",
              buckets = 256
            )
            .withColumnRenamed("id", "doc_id"),
          "doc_id",
          col("log_weight"),
          k = 100,
          salt = "dsir"
        )
        .orderBy("rank"),
    oracle = Some(s"""${TextQueries.dsirWeightSql(256)},
      g AS (SELECT doc_id, log_weight,
          md5(CAST(doc_id AS VARCHAR) || ':dsir') AS sh
        FROM w WHERE log_weight IS NOT NULL),
      sk AS (SELECT doc_id, round(log_weight
          - ln(-ln((${sqlHex52("sh")} + 1) / 4503599627370497.0)), 6)
          AS sample_key
        FROM g),
      r AS (SELECT doc_id, sample_key,
          ROW_NUMBER() OVER (ORDER BY sample_key DESC, doc_id) AS rank
        FROM sk)
      SELECT rank, doc_id, sample_key FROM r WHERE rank <= 100
      ORDER BY rank""")
  )

  val queries: Map[String, Q] = Map(
    "pipeline_dsir_sample" -> dsirSampleQ,
    "pipeline_source_cap" -> sourceCapQ,
    "pipeline_corpus_funnel" -> funnelQ,
    "pipeline_shuffle_shards" -> shuffleShardsQ,
    "pipeline_corpus_stats" -> statsQ,
    "pipeline_corpus_decon" -> funnelDeconQ,
    "pipeline_dedup_prior" -> dedupPriorQ,
    "pipeline_mixture_sample" -> mixtureQ,
    "pipeline_mixture_temperature" -> mixtureTemperatureQ,
    "pipeline_mixture_tokens" -> mixtureTokensQ,
    "pipeline_quality_cut" -> qualityCutQ
  )
}
