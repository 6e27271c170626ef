package graft.queries

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.functions._

/** Text-analysis queries (SURVEY §2.6) over `documents`. */
object TextQueries extends QueryPack {

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  // case-insensitive, mirroring Text.hitCount's lower(t) membership test
  private def swCountSql(lang: String): String =
    s"len(list_filter(string_split(text, ' '), t -> lower(t) IN ${inList(Text.stopwords(lang))}))"

  // Cross-source length-distribution KS: "do my sources draw docs
  // from the same length distribution" — the mixture-QA twin of the
  // day-over-day drift KS
  private val lengthKsQ = Q(
    fn = (s, d) =>
      graft.profiler.Drift
        .ksBetweenGroups(Tables.documents(s, d), "source", "n_chars")
        .orderBy("group_a", "group_b"),
    oracle = Some("""
      WITH c AS (SELECT source AS g, n_chars AS v, count(*) AS n
        FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
        GROUP BY 1, 2),
      gs AS (SELECT DISTINCT g FROM c),
      p AS (SELECT a.g AS ga, b.g AS gb FROM gs a CROSS JOIN gs b
        WHERE a.g < b.g),
      m AS (SELECT ga, gb, v, SUM(na) AS na, SUM(nb) AS nb FROM (
          SELECT p.ga, p.gb, c.v, c.n AS na, 0 AS nb FROM p
            JOIN c ON c.g = p.ga
          UNION ALL
          SELECT p.ga, p.gb, c.v, 0, c.n FROM p JOIN c ON c.g = p.gb)
        GROUP BY 1, 2, 3),
      t AS (SELECT ga, gb, CAST(SUM(na) AS BIGINT) AS nat,
          CAST(SUM(nb) AS BIGINT) AS nbt
        FROM m GROUP BY 1, 2 HAVING SUM(na) > 0 AND SUM(nb) > 0),
      cdf AS (SELECT m.ga, m.gb, t.nat, t.nbt,
          SUM(m.na) OVER w AS ca, SUM(m.nb) OVER w AS cb
        FROM m JOIN t ON m.ga = t.ga AND m.gb = t.gb
        WINDOW w AS (PARTITION BY m.ga, m.gb ORDER BY m.v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT ga AS group_a, gb AS group_b,
        max(nat) AS n_a, max(nbt) AS n_b,
        round(max(abs(CAST(ca AS DOUBLE) / nat
          - CAST(cb AS DOUBLE) / nbt)), 6) AS ks
      FROM cdf GROUP BY 1, 2 ORDER BY group_a, group_b""")
  )

  // Flesch reading ease, scan-side (vowel-group syllable
  // approximation; sentence floor 1 mirrored in both engines)
  private val readabilityQ = Q(
    fn = (s, d) =>
      Text
        .readability(Tables.documents(s, d), "text", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(s"""
      WITH b AS (SELECT doc_id,
          -- non-empty tokens only, mirroring Text.readability
          len(list_filter(string_split(text, ' '), t -> t <> '')) AS w,
          greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS st,
          len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy
        FROM documents)
      SELECT doc_id, w AS n_words, CAST(st AS INT) AS n_sentences,
        CAST(sy AS INT) AS n_syllables,
        CASE WHEN w > 0 THEN
          ${sqlRound6(
        "206.835 - 1.015 * (CAST(w AS DOUBLE) / st) - 84.6 * (CAST(sy AS DOUBLE) / w)"
      )}
        END AS flesch
      FROM b ORDER BY doc_id""")
  )

  private val tokensQ = Q(
    fn = (s, d) =>
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          Text.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars"),
          Text.bpeTokenCount(col("text")).as("n_bpe_tokens"),
          round6(Text.meanWordLen(col("text"))).as("mean_word_len")
        )
        .orderBy("doc_id"),
    oracle = Some(s"""
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        length(text) AS n_chars,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
        ${sqlRound6("CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))")} AS mean_word_len
      FROM documents ORDER BY doc_id""")
  )

  private val qualityQ = Q(
    fn = (s, d) =>
      // Components materialize once (mirrors the oracle CTE); quality is
      // rebuilt from the attributes with the identical arithmetic order.
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          Text.stopwordRatio(col("text")).as("_swr"),
          Text.punctRatio(col("text")).as("_pr"),
          Text.tokenCount(col("text")).as("_ntok"),
          Text.meanWordLen(col("text")).as("_mwl")
        )
        .select(
          col("doc_id"),
          round6(col("_swr")).as("stopword_ratio"),
          round6(col("_pr")).as("punct_ratio"),
          round6(
            lit(0.3) * col("_swr") + lit(0.2) * (lit(1.0) - col("_pr")) +
              lit(0.3) * least(col("_ntok").cast("double") / 100.0, lit(1.0)) +
              lit(0.2) * least(col("_mwl") / 8.0, lit(1.0))
          ).as("quality")
        )
        .orderBy("doc_id"),
    oracle = Some(s"""
      WITH t AS (
        SELECT doc_id,
          CAST(${swCountSql("en")} AS DOUBLE) / len(string_split(text, ' ')) AS swr,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
            / length(text) AS pr,
          len(string_split(text, ' ')) AS ntok,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')) AS mwl
        FROM documents)
      SELECT doc_id, ${sqlRound6("swr")} AS stopword_ratio,
        ${sqlRound6("pr")} AS punct_ratio,
        ${sqlRound6(
        """0.3 * swr + 0.2 * (1.0 - pr)
          + 0.3 * least(CAST(ntok AS DOUBLE) / 100.0, 1.0)
          + 0.2 * least(mwl / 8.0, 1.0)"""
      )} AS quality
      FROM t ORDER BY doc_id""")
  )

  private val langidQ = Q(
    fn = (s, d) =>
      Tables
        .documents(s, d)
        .select(col("doc_id"), col("lang"), Text.langId(col("text")).as("predicted"))
        .orderBy("doc_id"),
    oracle = Some(s"""
      WITH c AS (
        SELECT doc_id, lang,
          ${swCountSql("en")} AS c_en, ${swCountSql("de")} AS c_de,
          ${swCountSql("fr")} AS c_fr, ${swCountSql("es")} AS c_es
        FROM documents),
      m AS (SELECT *, greatest(c_en, c_de, c_fr, c_es) AS mx FROM c)
      SELECT doc_id, lang,
        CASE WHEN c_en = mx AND mx > 0 THEN 'en'
             WHEN c_de = mx AND mx > 0 THEN 'de'
             WHEN c_fr = mx AND mx > 0 THEN 'fr'
             WHEN c_es = mx AND mx > 0 THEN 'es'
             ELSE 'und' END AS predicted
      FROM m ORDER BY doc_id""")
  )

  /** Language-ID confusion matrix — the eval surface for the n-gram
    * heuristic: counts per (labeled lang, predicted lang). On the
    * synthetic corpus the text carries no real language signal, so the
    * matrix is honest about what the heuristic can and cannot see —
    * exactly the table a curation team reads before trusting a
    * language gate. One map-side-combined groupBy; |langs|² rows of
    * state at any corpus size.
    */
  private val langidConfusionQ = Q(
    fn = (s, d) =>
      Tables
        .documents(s, d)
        .select(col("lang"), Text.langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted"),
    oracle = Some(s"""
      WITH c AS (
        SELECT doc_id, lang,
          ${swCountSql("en")} AS c_en, ${swCountSql("de")} AS c_de,
          ${swCountSql("fr")} AS c_fr, ${swCountSql("es")} AS c_es
        FROM documents),
      m AS (SELECT *, greatest(c_en, c_de, c_fr, c_es) AS mx FROM c),
      p AS (SELECT lang,
          CASE WHEN c_en = mx AND mx > 0 THEN 'en'
               WHEN c_de = mx AND mx > 0 THEN 'de'
               WHEN c_fr = mx AND mx > 0 THEN 'fr'
               WHEN c_es = mx AND mx > 0 THEN 'es'
               ELSE 'und' END AS predicted
        FROM m)
      SELECT lang, predicted, count(*) AS n
      FROM p GROUP BY 1, 2 ORDER BY lang, predicted""")
  )

  /** URL canonicalization over in-plan-synthesized messy URLs — every
    * row exercises a real rule (case folding, default-port drop,
    * kept non-default port, tracking-param removal, param sort,
    * fragment drop, trailing-slash collapse, empty-path root, and a
    * non-URL residue row that must map to NULL). The oracle reproduces
    * the whole rule chain in DuckDB regex/list builtins.
    */
  private val urlCanonQ = Q(
    fn = (s, d) => {
      val id = col("doc_id").cast("string")
      val raw = when(
        pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("HTTPS://Example.COM:443/Path/"), id, lit("/?utm_source=x&b=2&a=1#frag"))
      ).when(
          pmod(col("doc_id"), lit(5)) === 1,
          concat(lit("http://site.org:8080/a//"), id, lit("?z=9&ref=abc"))
        )
        .when(pmod(col("doc_id"), lit(5)) === 2, lit("http://host.net:80?fbclid=1"))
        .when(pmod(col("doc_id"), lit(5)) === 3, concat(lit("https://h.io/p"), id))
        .otherwise(col("text"))
      Tables
        .documents(s, d)
        .select(col("doc_id"), Text.canonicalizeUrl(raw).as("url"))
        .orderBy("doc_id")
    },
    oracle = Some("""
      WITH s AS (SELECT doc_id, text,
        CASE CAST(doc_id % 5 AS INT)
          WHEN 0 THEN 'HTTPS://Example.COM:443/Path/' || CAST(doc_id AS VARCHAR) || '/?utm_source=x&b=2&a=1#frag'
          WHEN 1 THEN 'http://site.org:8080/a//' || CAST(doc_id AS VARCHAR) || '?z=9&ref=abc'
          WHEN 2 THEN 'http://host.net:80?fbclid=1'
          WHEN 3 THEN 'https://h.io/p' || CAST(doc_id AS VARCHAR)
          ELSE text END AS raw
        FROM documents),
      p AS (SELECT doc_id, regexp_replace(raw, '#.*$', '') AS nofrag FROM s),
      q AS (SELECT doc_id,
          lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
          regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
          regexp_extract(nofrag, '\?([^#]*)', 1) AS qs
        FROM p),
      r AS (SELECT doc_id, scheme,
          lower(regexp_replace(hostport, ':[0-9]+$', '')) AS host,
          -- numeric port render, mirroring canonicalizeUrl (':080' == ':80')
          CASE WHEN regexp_extract(hostport, ':([0-9]+)$', 1) <> ''
            THEN CAST(CAST(regexp_extract(hostport, ':([0-9]+)$', 1) AS INT) AS VARCHAR)
            ELSE '' END AS port,
          CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
               ELSE regexp_replace(rawpath, '/+$', '') END AS path,
          array_to_string(list_sort(list_filter(string_split(qs, '&'),
            x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=&]*|fbclid|gclid|ref)(=.*)?$'))), '&') AS sq
        FROM q)
      SELECT doc_id,
        CASE WHEN scheme = '' OR host = '' THEN NULL ELSE
          scheme || '://' || host ||
          CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
                AND NOT (scheme = 'https' AND port = '443')
            THEN ':' || port ELSE '' END ||
          path ||
          CASE WHEN sq <> '' THEN '?' || sq ELSE '' END
        END AS url
      FROM r ORDER BY doc_id""")
  )

  private val fingerprintQ = Q(
    fn = (s, d) =>
      Tables
        .documents(s, d)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
    oracle = Some("""
      SELECT doc_id,
        md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
          ' +', ' ', 'g'))) AS fingerprint
      FROM documents ORDER BY doc_id""")
  )

  private val jaccardQ = Q(
    fn = (s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.select(col("doc_id").as("id_a"), col("text").as("_ta"))
      val b = docs.select(col("doc_id").as("id_b"), col("text").as("_tb"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(
          col("id_a"),
          col("id_b"),
          Text
            .jaccard(Text.wordShingles(col("_ta"), 3), Text.wordShingles(col("_tb"), 3))
            .as("jaccard")
        )
        .orderBy("id_a")
    },
    oracle = Some("""
      WITH sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
            i -> concat_ws(' ', string_split(text, ' ')[i],
                 string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))) AS s
        FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
      ORDER BY id_a""")
  )

  private val tfidfQ = Q(
    fn = (s, d) =>
      Text
        .tfIdfTopK(Tables.documents(s, d), "text", "doc_id", k = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank"),
    oracle = Some("""
      WITH toks AS (SELECT doc_id,
          unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS term
        FROM documents),
      t AS (SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term <> '' GROUP BY 1, 2),
      d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      sc AS (SELECT doc_id, t.term,
               round((tf * ((n - df) + 0.5)) / (df + 0.5), 6) AS score
             FROM t JOIN d ON t.term = d.term CROSS JOIN n),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rank FROM sc)
      SELECT doc_id, term, score, rank FROM r WHERE rank <= 5
      ORDER BY doc_id, rank""")
  )

  private val unigramQ = Q(
    fn = (s, d) =>
      Text
        .unigramLogProb(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some("""
      WITH toks AS (SELECT doc_id,
          unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS term
        FROM documents),
      t AS (SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term <> '' GROUP BY 1, 2),
      c AS (SELECT term, sum(tf) AS cnt FROM t GROUP BY 1),
      n AS (SELECT sum(cnt) AS total FROM c),
      agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_terms,
          round(sum(tf * (ln(cnt) - ln(total))) / sum(tf), 6) AS avg_logprob
        FROM t JOIN c ON t.term = c.term CROSS JOIN n
        GROUP BY doc_id)
      -- join-back: zero-token docs return (0, NULL) instead of vanishing
      SELECT d.doc_id, coalesce(agg.n_terms, 0) AS n_terms, agg.avg_logprob
      FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
      ORDER BY d.doc_id""")
  )

  /** Interpolated bigram LM score (CCNet filter one order up from
    * `text_unigram_logprob`): ln(λ·P(w2|w1) + (1−λ)·P(w2)) averaged
    * per doc. λ literals are pinned as DOUBLE on both sides — Scala's
    * `1 - 0.7` is 0.30000000000000004 and the oracle must say exactly
    * that, not DECIMAL 0.3. Per-token contributions cross engines
    * through the DECIMAL(28,6) exact-sum policy.
    */
  private val bigramQ = Q(
    fn = (s, d) =>
      Text
        .bigramLogProb(Tables.documents(s, d), "text", "doc_id", lambda = 0.7)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x <> '') AS arr
        FROM documents),
      bg AS (SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
        FROM d, LATERAL unnest(range(1, len(arr))) AS g(i)),
      tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
      big AS (SELECT w1, w2, sum(tf) AS c2 FROM tf GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(c2) AS cc FROM big GROUP BY 1),
      uni AS (SELECT t AS term FROM d, LATERAL unnest(arr) AS u(t)),
      uc AS (SELECT term, count(*) AS c1 FROM uni GROUP BY 1),
      tot AS (SELECT sum(c1) AS total FROM uc),
      lp AS (SELECT tf.doc_id, tf.tf,
          ln(CAST(0.7 AS DOUBLE)
               * (CAST(big.c2 AS DOUBLE) / CAST(ctx.cc AS DOUBLE))
             + CAST(0.30000000000000004 AS DOUBLE)
               * (CAST(uc.c1 AS DOUBLE) / CAST(tot.total AS DOUBLE))) AS l
        FROM tf JOIN big ON tf.w1 = big.w1 AND tf.w2 = big.w2
        JOIN ctx ON tf.w1 = ctx.w1
        JOIN uc ON tf.w2 = uc.term CROSS JOIN tot),
      agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
          round(CAST(SUM(CAST(tf * l AS DECIMAL(28,6))) AS DOUBLE)
            / sum(tf), 6) AS avg_logprob
        FROM lp GROUP BY 1)
      SELECT doc_id, coalesce(n_bigrams, 0) AS n_bigrams, avg_logprob
      FROM documents LEFT JOIN agg USING (doc_id) ORDER BY doc_id""")
  )

  /** Shared DSIR oracle CTE chain ending in `w(doc_id, n_feats,
    * log_weight, avg_log_ratio)` — target = `lang = 'en'`, hashed
    * word-bigram features, add-1 smoothing over `buckets`. Reused by
    * the weight key here and the Gumbel resample key in
    * [[PipelineQueries]] so the composed sample is hash-verified on
    * top of the identical weight SQL.
    */
  private[queries] def dsirWeightSql(buckets: Int): String = s"""
      WITH d AS (SELECT doc_id, lang,
          list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x <> '') AS arr
        FROM documents),
      bg AS (SELECT doc_id, lang, md5(arr[i] || ' ' || arr[i+1]) AS h
        FROM d, LATERAL unnest(range(1, len(arr))) AS g(i)),
      fb AS (SELECT doc_id, lang, ${sqlHex52("h")} % $buckets AS bucket
        FROM bg),
      doc_b AS (SELECT doc_id, bucket, count(*) AS n FROM fb GROUP BY 1, 2),
      tgt AS (SELECT bucket, count(*) AS tc FROM fb WHERE lang = 'en'
        GROUP BY 1),
      rw AS (SELECT bucket, count(*) AS rc FROM fb GROUP BY 1),
      tots AS (SELECT count(*) FILTER (WHERE lang = 'en') AS tt,
          count(*) AS rt FROM fb),
      lr AS (SELECT rw.bucket,
          ln(CAST(coalesce(tgt.tc, 0) + 1 AS DOUBLE)
             / CAST(tt + $buckets AS DOUBLE))
          - ln(CAST(rw.rc + 1 AS DOUBLE)
             / CAST(rt + $buckets AS DOUBLE)) AS lr
        FROM rw LEFT JOIN tgt ON rw.bucket = tgt.bucket CROSS JOIN tots),
      w0 AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
          round(CAST(SUM(CAST(n * lr AS DECIMAL(28,6))) AS DOUBLE), 6)
            AS log_weight,
          round(CAST(SUM(CAST(n * lr AS DECIMAL(28,6))) AS DOUBLE)
            / sum(n), 6) AS avg_log_ratio
        FROM doc_b JOIN lr USING (bucket) GROUP BY 1),
      w AS (SELECT doc_id, coalesce(n_feats, 0) AS n_feats,
          log_weight, avg_log_ratio
        FROM documents LEFT JOIN w0 USING (doc_id))"""

  /** DSIR importance log-weights (Xie et al. 2023) — target =
    * English docs inside the same pool, 256 hashed-bigram buckets.
    */
  private val dsirWeightQ = Q(
    fn = (s, d) =>
      Text
        .dsirLogWeights(
          Tables.documents(s, d),
          "text",
          "doc_id",
          isTarget = col("lang") === "en",
          buckets = 256
        )
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(s"""${dsirWeightSql(256)}
      SELECT doc_id, n_feats, log_weight, avg_log_ratio FROM w
      ORDER BY doc_id""")
  )

  /** Character-distribution entropy per doc via the codegen'd
    * single-pass kernel (`mediaExpressions.CharEntropy`) — the
    * encoding-noise / gibberish signal (natural prose sits ~3-4.2
    * nats; base64 blobs and repeated-char junk sit far off). Kernel
    * uses the exact-count form H = ln n − (Σ c·ln c)/n summed over
    * sorted distinct code points; the oracle recomputes it from a
    * char unnest + group-by.
    */
  private val charEntropyQ = Q(
    fn = (s, d) =>
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          graft.functions.round6(
            graft.functions.mediaExpressions.charEntropy(col("text"))
          ).as("char_entropy")
        )
        .orderBy("doc_id"),
    oracle = Some("""
      WITH cc AS (SELECT doc_id, c, count(*) AS k
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
                FROM documents)
          GROUP BY 1, 2),
      n AS (SELECT doc_id, CAST(sum(k) AS DOUBLE) AS n FROM cc GROUP BY 1)
      SELECT doc_id,
        round(ln(n) - sum(k * ln(k)) / n, 6) AS char_entropy
      FROM cc JOIN n USING (doc_id) GROUP BY doc_id, n ORDER BY doc_id""")
  )

  /** Distributed BPE merge learning over the corpus (rows-only by
    * declared design: an iterative argmax loop with data-dependent
    * merge literals is not a SQL query — exactness vs the sequential
    * reference algorithm is spec-pinned instead, including
    * tie-breaks).
    */
  // 8 merges price the demo at ~0.4 s/round (each round is one
  // argmax job — overhead-bound on local[32], scale-bound on a
  // cluster); training a real 32k vocab is the same loop priced
  // per-merge
  private val bpeMergesQ = Q(
    fn = (s, d) =>
      Text
        .bpeTrain(Tables.documents(s, d), "text", numMerges = 8)
        .orderBy("rank"),
    oracle = None
  )

  /** BPE tokenization under a FIXED (previously learned) merge table —
    * prices the inference path alone: a zero-shuffle scan-side
    * projection (the train loop is `text_bpe_merges`' price; the
    * train→encode composition is spec-pinned end-to-end). Rows-only:
    * greedy iterative merging is not a SQL query; the kernel's
    * exactness is pinned vs the reference apply in MediaKernelsSpec.
    */
  private val bpeTokensQ = Q(
    fn = (s, d) => {
      val merges = Seq(
        "e" -> "</w>", "t" -> "h", "th" -> "e", "the" -> "</w>",
        "a" -> "n", "an" -> "d", "and" -> "</w>", "i" -> "n",
        "o" -> "n", "e" -> "r", "s" -> "</w>", "in" -> "g"
      )
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          Text.bpeEncode(col("text"), merges).as("_sub")
        )
        .select(
          col("doc_id"),
          size(col("_sub")).as("n_subwords"),
          // stringified head so the harness's rows-only sorter can
          // handle the column (array cells are unhashable to pandas)
          concat_ws(" ", slice(col("_sub"), lit(1), lit(12)))
            .as("head_subwords")
        )
        .orderBy("doc_id")
    },
    oracle = None
  )

  private val pmiQ = Q(
    fn = (s, d) =>
      Text
        .pmiBigrams(Tables.documents(s, d), "text", minCount = 5, k = 50)
        .orderBy("rank"),
    oracle = Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS s FROM documents),
      uni AS (SELECT unnest(s) AS w FROM toks),
      uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
      tu AS (SELECT count(*) AS n FROM uni),
      bi AS (SELECT s, unnest(generate_series(1, len(s) - 1)) AS i FROM toks),
      bc AS (SELECT s[i] AS w1, s[i + 1] AS w2, count(*) AS n_ab
             FROM bi GROUP BY 1, 2),
      tb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS m FROM bc),
      sc AS (SELECT w1, w2, n_ab,
          round((CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) /
                (CAST(m AS DOUBLE) * CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)),
                6) AS score
        FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w
          CROSS JOIN tu CROSS JOIN tb
        WHERE n_ab >= 5),
      r AS (SELECT *, row_number() OVER (ORDER BY score DESC, w1, w2) AS rank
            FROM sc)
      SELECT w1, w2, n_ab, score, rank FROM r WHERE rank <= 50 ORDER BY rank""")
  )

  private val chunkQ = Q(
    fn = (s, d) =>
      Text
        .chunk(Tables.documents(s, d), "text", "doc_id", window = 40, overlap = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_no"),
    oracle = Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      st AS (SELECT doc_id, s, len(s) AS n,
               unnest(generate_series(0, len(s) - 1, 30)) AS start
             FROM toks)
      SELECT doc_id, start // 30 AS chunk_no, start AS start_token,
        least(40, n - start) AS n_tokens,
        array_to_string(list_slice(s, start + 1, start + 40), ' ') AS chunk_text
      FROM st WHERE start = 0 OR n > start + 10
      ORDER BY doc_id, chunk_no""")
  )

  private val bm25Q = Q(
    fn = (s, d) =>
      Text
        .bm25Score(
          Tables.documents(s, d),
          "text",
          "doc_id",
          queryTerms = Seq("spark", "vector", "window")
        )
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some("""
      WITH toks AS (SELECT doc_id,
          unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS term
        FROM documents),
      t AS (SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term <> '' GROUP BY 1, 2),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM t GROUP BY 1),
      st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
             FROM dl),
      q AS (SELECT * FROM t WHERE term IN ('spark', 'vector', 'window')),
      d AS (SELECT term, count(*) AS df FROM q GROUP BY 1)
      SELECT q.doc_id, count(*) AS n_matched,
        round(CAST(sum(CAST(
          ((n - df + 0.5) / (df + 0.5)) *
          ((tf * (CAST(1.2 AS DOUBLE) + 1)) /
           (tf + CAST(1.2 AS DOUBLE) *
             ((1 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE) * dl / avgdl)))
          AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
      FROM q JOIN d ON q.term = d.term
        JOIN dl ON q.doc_id = dl.doc_id CROSS JOIN st
      GROUP BY q.doc_id ORDER BY q.doc_id""")
  )

  private val repetitionQ = Q(
    fn = (s, d) =>
      Text
        .repetitionSignals(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
    oracle = Some(s"""
      WITH toks AS (
        SELECT doc_id, 1 AS n, unnest(string_split(text, ' ')) AS g FROM documents),
      bis AS (
        SELECT doc_id, 2 AS n,
          unnest(list_transform(range(1, len(string_split(text, ' '))),
            i -> concat_ws(' ', string_split(text, ' ')[i],
                 string_split(text, ' ')[i+1]))) AS g
        FROM documents WHERE len(string_split(text, ' ')) >= 2),
      tris AS (
        SELECT doc_id, 3 AS n,
          unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
            i -> concat_ws(' ', string_split(text, ' ')[i],
                 string_split(text, ' ')[i+1], string_split(text, ' ')[i+2]))) AS g
        FROM documents WHERE len(string_split(text, ' ')) >= 3),
      allg AS (SELECT * FROM toks UNION ALL SELECT * FROM bis
               UNION ALL SELECT * FROM tris),
      c AS (SELECT doc_id, n, g, count(*) AS cnt FROM allg GROUP BY 1, 2, 3),
      st AS (SELECT doc_id,
              CAST(sum(CASE WHEN n = 1 THEN cnt END) AS BIGINT) AS n_tokens,
              count(CASE WHEN n = 1 THEN 1 END) AS n_dist,
              max(CASE WHEN n = 1 THEN cnt END) AS top_cnt,
              sum(CASE WHEN n = 2 THEN cnt END) AS n_bi,
              sum(CASE WHEN n = 2 AND cnt > 1 THEN cnt END) AS dup_bi,
              sum(CASE WHEN n = 3 AND cnt > 1 THEN cnt * length(g) END) AS dup_tri_chars
            FROM c GROUP BY 1)
      SELECT d.doc_id, st.n_tokens,
        ${sqlRound6("CAST(n_dist AS DOUBLE) / n_tokens")} AS distinct_token_ratio,
        ${sqlRound6("CAST(top_cnt AS DOUBLE) / n_tokens")} AS top_token_frac,
        CASE WHEN n_bi IS NULL THEN 0.0
             ELSE ${sqlRound6("CAST(COALESCE(dup_bi, 0) AS DOUBLE) / n_bi")}
        END AS dup_bigram_frac,
        ${sqlRound6("CAST(COALESCE(dup_tri_chars, 0) AS DOUBLE) / length(d.text)")}
          AS dup_trigram_char_frac
      FROM documents d JOIN st ON d.doc_id = st.doc_id
      ORDER BY d.doc_id""")
  )

  private val redactQ = Q(
    fn = (s, d) =>
      // events.props carries embedded numeric identifiers (the PII
      // stand-in this synthetic corpus has); full pattern family
      // (email/phone/ipv4) is spec-covered on crafted strings
      Tables
        .events(s, d)
        .select(
          col("event_id"),
          Text.redactionCount(col("props"), "[0-9]+").as("n_redactions"),
          Text.redact(col("props"), Seq("number" -> "[0-9]+")).as("redacted")
        )
        .orderBy("event_id"),
    oracle = Some("""
      SELECT event_id,
        len(regexp_extract_all(props, '[0-9]+')) AS n_redactions,
        regexp_replace(props, '[0-9]+', '[NUMBER]', 'g') AS redacted
      FROM events ORDER BY event_id""")
  )

  // Gopher-rule document filter: keep/drop with the first failing rule
  // as the reason. All signals are single-division ratios — bit-equal
  // across engines, no rounding needed on the comparisons themselves.
  private val gopherQ = Q(
    fn = (s, d) =>
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          Text.tokenCount(col("text")).as("n_words"),
          round6(Text.meanWordLen(col("text"))).as("mean_word_len"),
          round6(Text.punctRatio(col("text"))).as("symbol_ratio"),
          Text
            .hitCount(Text.tokens(col("text")), Text.stopwords("en"))
            .as("stopword_hits"),
          Text.gopherReason(col("text")).as("reason")
        )
        .withColumn("keep", col("reason") === "ok")
        .orderBy("doc_id"),
    oracle = Some(s"""
      WITH t AS (
        SELECT doc_id,
          len(string_split(text, ' ')) AS n_words,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')) AS mwl,
          CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
            / length(text) AS pr,
          ${swCountSql("en")} AS sw_hits
        FROM documents),
      r AS (
        SELECT *,
          CASE WHEN n_words < 40 THEN 'too_short'
               WHEN n_words > 100000 THEN 'too_long'
               WHEN mwl < 3.0 OR mwl > 10.0 THEN 'word_len'
               WHEN pr > 0.1 THEN 'symbol_ratio'
               WHEN sw_hits < 2 THEN 'few_stopwords'
               ELSE 'ok' END AS reason
        FROM t)
      SELECT doc_id, n_words, ${sqlRound6("mwl")} AS mean_word_len,
        ${sqlRound6("pr")} AS symbol_ratio, sw_hits AS stopword_hits,
        reason, reason = 'ok' AS keep
      FROM r ORDER BY doc_id""")
  )

  // Per-document duplicated-span fraction (RefinedWeb-style filter
  // signal): how much of the document is corpus-duplicated 8-word
  // spans.
  private val dupSpanFractionQ = Q(
    fn = (s, d) =>
      graft.dedup.Dedup
        .dupSpanStats(
          Tables.documents(s, d),
          "text",
          "doc_id",
          spanWords = 8,
          minDocs = 2
        )
        .orderBy("doc_id"),
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      s AS (SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS h
            FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)
            WHERE len(toks) >= 8),
      dup AS (SELECT h FROM s GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      per AS (
        SELECT s.doc_id, COUNT(*) AS n_spans,
          COUNT(dup.h) AS n_dup_spans
        FROM s LEFT OUTER JOIN dup ON s.h = dup.h
        GROUP BY s.doc_id)
      SELECT d.doc_id,
        COALESCE(per.n_spans, 0) AS n_spans,
        COALESCE(per.n_dup_spans, 0) AS n_dup_spans,
        CASE WHEN COALESCE(per.n_spans, 0) = 0 THEN 0.0
             ELSE round(CAST(per.n_dup_spans AS DOUBLE) / per.n_spans, 6)
        END AS dup_fraction
      FROM documents d LEFT OUTER JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id""")
  )

  // corpus-wide top bigrams: vocab induction / boilerplate discovery
  private val topNgramsQ = Q(
    fn = (s, d) =>
      Text
        .topNgrams(Tables.documents(s, d), "text", n = 2, k = 20)
        .orderBy("rank"),
    oracle = Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      bi AS (SELECT concat_ws(' ', t[i], t[i+1]) AS ngram
             FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
             WHERE len(t) >= 2),
      c AS (SELECT ngram, count(*) AS count FROM bi GROUP BY ngram),
      r AS (SELECT *, row_number() OVER (ORDER BY count DESC, ngram) AS rank FROM c)
      SELECT ngram, count, rank FROM r WHERE rank <= 20 ORDER BY rank""")
  )

  // ---- discriminative quality classifier (graft.ml.Logit) ------------
  // Weak-label demo of the CCNet-style curation classifier: label =
  // "long document" (n_chars > 300, ~balanced on the synthetic corpus),
  // features = stopword ratio / mean word length / capped token count.
  // Token count predicts the label, so 3 gradient rounds measurably
  // separate the classes — the fit, not just the scoring, is under test.
  // All features bounded to [0,1] (mwl capped at /8 like qualityScore):
  // full-batch GD at rate lr is stable only while lr·λmax(XᵀX/n) < 2,
  // and unnormalized features (mwl ≈ 4.5) were measured to oscillate
  // into all-ones saturation at any useful rate.
  private val logitFeats = Seq("x1", "x2", "x3")
  private val logitIters = 6
  private val logitLr = 1.5

  private def logitFrame(
      s: org.apache.spark.sql.SparkSession,
      d: String
  ): org.apache.spark.sql.DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("source"),
        when(col("n_chars") > 300, 1.0).otherwise(0.0).as("label"),
        round6(Text.stopwordRatio(col("text"))).as("x1"),
        round6(least(Text.meanWordLen(col("text")) / 8.0, lit(1.0))).as("x2"),
        round6(least(Text.tokenCount(col("text")).cast("double") / 100.0, lit(1.0)))
          .as("x3"),
        // synthetic per-row importance (exact dyadic values 0.5/0.75/
        // 1.0 — no rounding needed) for the weighted-training key
        (lit(0.5) + pmod(col("doc_id"), lit(3)) * lit(0.25)).as("w")
      )

  /** The fit unrolled per iteration: weights start at 0, each round is
    * one CTE pair (per-row round6'd sigmoid, DECIMAL(28,6) gradient
    * sums) plus a one-row weight-update CTE with the identical
    * left-to-right arithmetic — so the oracle hash-verifies the
    * TRAINED model, not just the scoring pass (same unrolled-iteration
    * precedent as embed_kmeans and the MMR greedy).
    */
  private def logitMarginSql(w: String, f: String): String =
    s"$w.b0 + $w.b1 * $f.x1 + $w.b2 * $f.x2 + $w.b3 * $f.x3"

  /** The (doc_id, y, x1..x3) feature projection, sans WITH/alias —
    * wrapped by the plain chain and the cross-validation chain.
    */
  private val logitFeatSelect = s"""SELECT doc_id, source,
        CAST(CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y,
        round(CAST(${swCountSql("en")} AS DOUBLE) / len(string_split(text, ' ')), 6) AS x1,
        round(least(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) / 8.0, 1.0), 6) AS x2,
        round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0), 6) AS x3,
        CAST(0.5 + (doc_id % 3) * 0.25 AS DOUBLE) AS w
      FROM documents"""

  /** One training run as CTEs `w0$sfx..w$iters$sfx` over source table
    * `src` (suffix keeps multiple runs coexisting in one WITH — the
    * cross-validation oracle trains `folds` models side by side).
    */
  private def logitFitSql(
      iters: Int,
      lr: Double,
      src: String,
      sfx: String,
      weight: Option[String] = None
  ): String = {
    val l = lr.toString
    def gradTerm(x: String): String = weight match {
      case Some(wc) =>
        s"CAST(SUM(CAST(round($wc * round($x * (y - p), 6), 6) AS DECIMAL(28,6))) AS DOUBLE)"
      case None =>
        s"CAST(SUM(CAST(round($x * (y - p), 6) AS DECIMAL(28,6))) AS DOUBLE)"
    }
    val denom = weight match {
      case Some(wc) => s"CAST(SUM(CAST($wc AS DECIMAL(28,6))) AS DOUBLE)"
      case None     => "CAST(count(*) AS DOUBLE)"
    }
    val steps = (1 to iters)
      .map { t =>
        s"""m$t$sfx AS (
        SELECT s.*, round(1.0 / (1.0 + exp(-(${logitMarginSql(s"w${t - 1}$sfx", "s")}))), 6) AS p
        FROM $src s, w${t - 1}$sfx),
      g$t$sfx AS (
        SELECT $denom AS n,
          ${gradTerm("1.0")} AS g0, ${gradTerm("x1")} AS g1,
          ${gradTerm("x2")} AS g2, ${gradTerm("x3")} AS g3
        FROM m$t$sfx),
      w$t$sfx AS (
        SELECT round(w.b0 + $l * g.g0 / g.n, 6) AS b0,
          round(w.b1 + $l * g.g1 / g.n, 6) AS b1,
          round(w.b2 + $l * g.g2 / g.n, 6) AS b2,
          round(w.b3 + $l * g.g3 / g.n, 6) AS b3
        FROM w${t - 1}$sfx w, g$t$sfx g)"""
      }
      .mkString(",\n")
    s"""w0$sfx AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3),
    $steps"""
  }

  /** The fit unrolled per iteration: weights start at 0, each round is
    * one CTE pair (per-row round6'd sigmoid, DECIMAL(28,6) gradient
    * sums) plus a one-row weight-update CTE with the identical
    * left-to-right arithmetic — so the oracle hash-verifies the
    * TRAINED model, not just the scoring pass (same unrolled-iteration
    * precedent as embed_kmeans and the MMR greedy).
    */
  private def logitChainSql(iters: Int, lr: Double): String =
    s"""
    WITH f AS ($logitFeatSelect),
    ${logitFitSql(iters, lr, "f", "")},
    scored AS (
      SELECT f.doc_id, f.y,
        round(1.0 / (1.0 + exp(-(${logitMarginSql(s"w$iters", "f")}))), 6) AS score
      FROM f, w$iters)"""

  /** Tie-aware Mann-Whitney over a `(y, score)` table `src`, as CTEs
    * `d/c/t$sfx`; [[logitAucSelectSql]] reads the statistic off
    * `t$sfx`.
    */
  private def logitAucSql(src: String, sfx: String): String = s"""
      d$sfx AS (SELECT score, CAST(SUM(y) AS BIGINT) AS pos, count(*) AS cnt
        FROM $src GROUP BY score),
      c$sfx AS (SELECT score, pos, cnt,
          SUM(cnt) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cumb
        FROM d$sfx),
      t$sfx AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
          CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
          SUM(CAST(pos AS DECIMAL(38,0))
            * CAST(2 * cumb + cnt + 1 AS DECIMAL(38,0))) AS sr2
        FROM c$sfx)"""

  private def logitAucSelectSql(t: String): String =
    s"""CASE WHEN $t.n_pos > 0 AND $t.n_neg > 0 THEN
          round(CAST($t.sr2 - CAST($t.n_pos AS DECIMAL(38,0)) * ($t.n_pos + 1) AS DOUBLE)
            / (2.0 * $t.n_pos * $t.n_neg), 6) END"""

  private val logitQ = Q(
    fn = (s, d) => {
      val f = logitFrame(s, d)
      val m = graft.ml.Logit.fit(f, "label", logitFeats, logitIters, logitLr)
      graft.ml.Logit
        .scored(f, m, logitFeats)
        .select("doc_id", "label", "score", "pred")
        .orderBy("doc_id")
    },
    oracle = Some(s"""${logitChainSql(logitIters, logitLr)}
      SELECT doc_id, y AS label, score,
        CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS INT) AS pred
      FROM scored ORDER BY doc_id""")
  )

  private val logitThresholds = Seq(0.4, 0.45, 0.5, 0.55, 0.6)

  private val logitEvalQ = Q(
    fn = (s, d) => {
      val f = logitFrame(s, d)
      val m = graft.ml.Logit.fit(f, "label", logitFeats, logitIters, logitLr)
      graft.ml.Logit
        .prCurve(
          graft.ml.Logit.scored(f, m, logitFeats),
          "label",
          "score",
          logitThresholds
        )
        .orderBy("threshold")
    },
    oracle = Some {
      val p = "CAST(tp AS DOUBLE) / (tp + fp)"
      val r = "CAST(tp AS DOUBLE) / (tp + fn)"
      s"""${logitChainSql(logitIters, logitLr)},
      th AS (SELECT CAST(threshold AS DOUBLE) AS threshold
        FROM (VALUES ${logitThresholds
          .map(t => s"(${t.toString})")
          .mkString(", ")}) v(threshold)),
      pr AS (
        SELECT t.threshold,
          CAST(SUM(CASE WHEN s.score >= t.threshold AND s.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN s.score >= t.threshold AND s.y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN s.score < t.threshold AND s.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          CAST(SUM(CASE WHEN s.score < t.threshold AND s.y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM scored s CROSS JOIN th t GROUP BY 1)
      SELECT threshold, tp, fp, fn, tn,
        CASE WHEN tp + fp > 0 THEN round($p, 6) END AS prec,
        CASE WHEN tp + fn > 0 THEN round($r, 6) END AS rec,
        CASE WHEN tp + fp > 0 AND tp + fn > 0 AND ($p + $r) > 0.0
          THEN round(2.0 * ($p) * ($r) / (($p) + ($r)), 6) END AS f1
      FROM pr ORDER BY threshold"""
    }
  )

  private val logitAucQ = Q(
    fn = (s, d) => {
      val f = logitFrame(s, d)
      val m = graft.ml.Logit.fit(f, "label", logitFeats, logitIters, logitLr)
      graft.ml.Logit
        .auc(graft.ml.Logit.scored(f, m, logitFeats), "label", "score")
    },
    oracle = Some(s"""${logitChainSql(logitIters, logitLr)},
      ${logitAucSql("scored", "")}
      SELECT n_pos, n_neg, ${logitAucSelectSql("t")} AS auc
      FROM t""")
  )

  private val logitAucBySourceQ = Q(
    fn = (s, d) => {
      val f = logitFrame(s, d)
      val m = graft.ml.Logit.fit(f, "label", logitFeats, logitIters, logitLr)
      graft.ml.Logit
        .aucByGroup(
          graft.ml.Logit.scored(f, m, logitFeats),
          "source",
          "label",
          "score"
        )
        .orderBy("source")
    },
    oracle = Some(s"""${logitChainSql(logitIters, logitLr)},
      scoredg AS (
        SELECT f.doc_id, f.source, f.y,
          round(1.0 / (1.0 + exp(-(${logitMarginSql(s"w$logitIters", "f")}))), 6) AS score
        FROM f, w$logitIters),
      dg AS (SELECT source, score, CAST(SUM(y) AS BIGINT) AS pos,
          count(*) AS cnt
        FROM scoredg GROUP BY 1, 2),
      cg AS (SELECT source, score, pos, cnt,
          SUM(cnt) OVER (PARTITION BY source ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cumb
        FROM dg),
      tg AS (SELECT source, CAST(SUM(pos) AS BIGINT) AS n_pos,
          CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
          SUM(CAST(pos AS DECIMAL(38,0))
            * CAST(2 * cumb + cnt + 1 AS DECIMAL(38,0))) AS sr2
        FROM cg GROUP BY source)
      SELECT source, n_pos, n_neg, ${logitAucSelectSql("tg")} AS auc
      FROM tg ORDER BY source""")
  )

  private val logitWeightedQ = Q(
    fn = (s, d) => {
      val f = logitFrame(s, d)
      val m = graft.ml.Logit
        .fitWeighted(f, "label", logitFeats, "w", logitIters, logitLr)
      graft.ml.Logit
        .scored(f, m, logitFeats)
        .select("doc_id", "label", "score", "pred")
        .orderBy("doc_id")
    },
    oracle = Some(s"""
      WITH f AS ($logitFeatSelect),
      ${logitFitSql(logitIters, logitLr, "f", "_w", Some("w"))},
      scored AS (
        SELECT f.doc_id, f.y,
          round(1.0 / (1.0 + exp(-(${logitMarginSql(s"w${logitIters}_w", "f")}))), 6) AS score
        FROM f, w${logitIters}_w)
      SELECT doc_id, y AS label, score,
        CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS INT) AS pred
      FROM scored ORDER BY doc_id""")
  )

  private val logitFeaturesQ = Q(
    fn = (s, d) =>
      graft.ml.Logit
        .featureStats(logitFrame(s, d), "label", logitFeats)
        .orderBy("feature"),
    oracle = Some {
      def sums(x: String): String =
        s"""CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE) AS sx_$x,
          CAST(SUM(CAST($x * $x AS DECIMAL(38,12))) AS DOUBLE) AS sxx_$x,
          CAST(SUM(CAST(CASE WHEN y = 1.0 THEN $x ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS sxy_$x"""
      val unions = logitFeats
        .map(x =>
          s"SELECT '$x' AS feature, n, n1, sx_$x AS sx, sxx_$x AS sxx, sxy_$x AS sxy FROM a"
        )
        .mkString(" UNION ALL ")
      s"""
      WITH f AS ($logitFeatSelect),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n1,
        ${logitFeats.map(sums).mkString(",\n        ")}
        FROM f),
      u AS ($unions)
      SELECT feature, n, n1 AS n_pos,
        CASE WHEN n1 > 0 THEN round(sxy / CAST(n1 AS DOUBLE), 6) END AS mean_pos,
        CASE WHEN n - n1 > 0 THEN
          round((sx - sxy) / CAST(n - n1 AS DOUBLE), 6) END AS mean_neg,
        CASE WHEN n1 > 0 AND n - n1 > 0 AND
          sxx / CAST(n AS DOUBLE)
            - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) > 0.0
        THEN round(
          (sxy / CAST(n1 AS DOUBLE) - (sx - sxy) / CAST(n - n1 AS DOUBLE))
          / sqrt(sxx / CAST(n AS DOUBLE)
            - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
          * sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) END AS corr
      FROM u ORDER BY feature"""
    }
  )

  private val logitFolds = 3

  private val logitCvQ = Q(
    fn = (s, d) =>
      graft.ml.Logit
        .cvAuc(
          logitFrame(s, d),
          "label",
          logitFeats,
          "doc_id",
          folds = logitFolds,
          iters = logitIters,
          lr = logitLr
        )
        .orderBy("fold"),
    oracle = Some {
      val perFold = (0 until logitFolds)
        .map { k =>
          s"""tr_$k AS (SELECT * FROM f WHERE fold <> $k),
          te_$k AS (SELECT * FROM f WHERE fold = $k),
          ${logitFitSql(logitIters, logitLr, s"tr_$k", s"_$k")},
          sc_$k AS (
            SELECT te.doc_id, te.y,
              round(1.0 / (1.0 + exp(-(${logitMarginSql(s"w${logitIters}_$k", "te")}))), 6) AS score
            FROM te_$k te, w${logitIters}_$k),
          ${logitAucSql(s"sc_$k", s"_$k")}"""
        }
        .mkString(",\n")
      val unions = (0 until logitFolds)
        .map { k =>
          s"""SELECT $k AS fold, CAST(g1_$k.n AS BIGINT) AS n_train,
            t_$k.n_pos, t_$k.n_neg, ${logitAucSelectSql(s"t_$k")} AS auc
          FROM g1_$k, t_$k"""
        }
        .mkString(" UNION ALL ")
      s"""
      WITH f0 AS ($logitFeatSelect),
      fh AS (SELECT f0.*,
          substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 13) AS h13
        FROM f0),
      f AS (SELECT doc_id, y, x1, x2, x3,
          CAST((${sqlHex52("h13")}) % $logitFolds AS INT) AS fold
        FROM fh),
      $perFold
      SELECT * FROM ($unions) ORDER BY fold"""
    }
  )

  private val logitCalibrationQ = Q(
    fn = (s, d) => {
      val f = logitFrame(s, d)
      val m = graft.ml.Logit.fit(f, "label", logitFeats, logitIters, logitLr)
      graft.ml.Logit
        .calibration(
          graft.ml.Logit.scored(f, m, logitFeats),
          "label",
          "score",
          bins = 10
        )
        .orderBy("bin")
    },
    oracle = Some(s"""${logitChainSql(logitIters, logitLr)},
      b AS (SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin, score, y
        FROM scored)
      SELECT bin, count(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
        round(CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
          AS mean_score,
        round(CAST(SUM(y) AS DOUBLE) / count(*), 6) AS pos_rate
      FROM b GROUP BY bin ORDER BY bin""")
  )

  private val logitHardQ = Q(
    fn = (s, d) => {
      val f = logitFrame(s, d)
      val m = graft.ml.Logit.fit(f, "label", logitFeats, logitIters, logitLr)
      graft.ml.Logit
        .hardExamples(
          graft.ml.Logit.scored(f, m, logitFeats),
          "label",
          "score",
          "doc_id",
          k = 10
        )
        .orderBy("label", "rank")
    },
    oracle = Some(s"""${logitChainSql(logitIters, logitLr)},
      r AS (SELECT y AS label, doc_id, score,
          ROW_NUMBER() OVER (PARTITION BY y
            ORDER BY CASE WHEN y = 1.0 THEN -score ELSE score END DESC,
              doc_id) AS rank
        FROM scored)
      SELECT label, CAST(rank AS INT) AS rank, doc_id, score
      FROM r WHERE rank <= 10 ORDER BY label, rank""")
  )

  /** Unicode canonicalization through the codegen'd kernels, against
    * DuckDB's utf8proc-backed `nfc_normalize`/`strip_accents` — two
    * INDEPENDENT Unicode implementations (ICU-lineage JDK vs utf8proc)
    * agreeing byte-for-byte is the strongest oracle in the text pack.
    * Inputs are documents text with decomposed/precomposed/ligature
    * codepoints appended in-plan (chr() on the SQL side, escape
    * literals on the Spark side), so every row exercises a real
    * normalization, not an ASCII no-op.
    */
  private val unicodeQ = Q(
    fn = (s, d) =>
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          concat(
            substring(col("text"), 1, 16),
            lit(" re\u0301sume\u0301 \u00e9 \ufb01")
          ).as("_s")
        )
        .select(
          col("doc_id"),
          Text.unicodeNormalize(col("_s")).as("nfc"),
          Text.stripAccents(Text.unicodeNormalize(col("_s"))).as("stripped"),
          (Text.unicodeNormalize(col("_s")) =!= col("_s"))
            .cast("int")
            .as("changed")
        )
        .orderBy("doc_id"),
    oracle = Some("""
      WITH s AS (SELECT doc_id,
          substr(text, 1, 16) || ' re' || chr(769) || 'sume' || chr(769)
            || ' ' || chr(233) || ' ' || chr(64257) AS s
        FROM documents)
      SELECT doc_id, nfc_normalize(s) AS nfc,
        strip_accents(nfc_normalize(s)) AS stripped,
        CAST(CASE WHEN nfc_normalize(s) <> s THEN 1 ELSE 0 END AS INT) AS changed
      FROM s ORDER BY doc_id""")
  )

  val queries: Map[String, Q] = Map(
    "text_top_ngrams" -> topNgramsQ,
    "text_gopher_filter" -> gopherQ,
    "text_dup_span_fraction" -> dupSpanFractionQ,
    "text_redact" -> redactQ,
    "text_repetition" -> repetitionQ,
    "text_tfidf" -> tfidfQ,
    "text_bm25" -> bm25Q,
    "text_chunk" -> chunkQ,
    "text_pmi_bigrams" -> pmiQ,
    "text_unigram_logprob" -> unigramQ,
    "text_bigram_logprob" -> bigramQ,
    "text_dsir_logweight" -> dsirWeightQ,
    "text_char_entropy" -> charEntropyQ,
    "text_bpe_merges" -> bpeMergesQ,
    "text_bpe_tokens" -> bpeTokensQ,
    "text_tokens" -> tokensQ,
    "text_readability" -> readabilityQ,
    "text_length_ks" -> lengthKsQ,
    "text_quality" -> qualityQ,
    "text_quality_logit" -> logitQ,
    "text_quality_logit_weighted" -> logitWeightedQ,
    "text_quality_logit_features" -> logitFeaturesQ,
    "text_quality_logit_eval" -> logitEvalQ,
    "text_quality_logit_auc" -> logitAucQ,
    "text_quality_logit_auc_by_source" -> logitAucBySourceQ,
    "text_quality_logit_cv" -> logitCvQ,
    "text_quality_logit_hard" -> logitHardQ,
    "text_quality_logit_calibration" -> logitCalibrationQ,
    "text_langid" -> langidQ,
    "text_langid_confusion" -> langidConfusionQ,
    "text_fingerprint" -> fingerprintQ,
    "text_unicode_normalize" -> unicodeQ,
    "text_url_canonicalize" -> urlCanonQ,
    "text_ngram_jaccard" -> jaccardQ
  )
}
