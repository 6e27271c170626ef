package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // 60 prose-like words with plenty of English stopwords: passes every
  // gopher rule and language-ids as "en"
  private val goodText: String =
    Iterator
      .continually(Seq("the", "quick", "brown", "fox", "and", "the", "lazy", "dog",
        "walked", "over", "a", "hill"))
      .flatten
      .take(60)
      .mkString(" ")

  test("prepareFunnel tags the first failing stage, in stage order") {
    val docs = Seq(
      (1L, goodText), // kept
      (2L, "short text only"), // too_short fires before everything else
      (3L, Iterator.continually("xxxxxxxxxxxxxxxx").take(60).mkString(" ")), // word_len
      (4L, Iterator.continually("der und die das ist ein nicht mit sich auf").take(6).mkString(" ")) // non_english (gopher-ok via shared stopword floor? -> see assert)
    ).toDF("doc_id", "text")
    val out = Corpus.prepareFunnel(docs).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("drop_reason")).take(3).toSeq ===
      Seq("kept", "too_short", "word_len"))
    // doc 4 has zero English stopword hits: gopher's few_stopwords
    // fires BEFORE the language gate ever sees it — first-failing
    // means the reason is few_stopwords, not non_english
    assert(out(3).getAs[String]("drop_reason") === "few_stopwords")
    assert(out.map(_.getAs[Boolean]("kept")).toSeq === Seq(true, false, false, false))
  }

  test("semantic dedup stage demotes kept paraphrases only") {
    // two lexically DIFFERENT texts (distinct fingerprints — exact
    // dedup keeps both) with near-identical embeddings; a rule-failed
    // doc shares the embedding but must keep its lexical reason and
    // must not consume the semantic slot; an orthogonal doc survives
    val textB = goodText.replace("fox", "wolf")
    val docs = Seq(
      (1L, goodText, Array(1.0f, 0.0f)),
      (2L, textB, Array(0.999f, 0.01f)),
      (3L, "short text only", Array(1.0f, 0.0f)),
      (4L, goodText.replace("dog", "cat"), Array(0.0f, 1.0f))
    ).toDF("doc_id", "text", "embedding")
    val out = Corpus
      .semanticDedupStage(
        Corpus.prepareFunnel(docs), "embedding", threshold = 0.9, nlist = 1)
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getAs[String]("drop_reason")).toSeq ===
      Seq("kept", "semantic_duplicate", "too_short", "kept"))
    assert(out.map(_.getAs[Boolean]("kept")).toSeq ===
      Seq(true, false, false, true))
  }

  test("null-id kept rows pass through both semantic stages undemoted") {
    // r7 ADVICE defect: a kept row with NULL id can never equi-join
    // the survivor side, so the dedup stage demoted it unconditionally
    // — silent data loss where every other stage passes null ids
    // through. Null ids now SKIP semantic dedup instead.
    val docs = Seq(
      (java.lang.Long.valueOf(1L), goodText, Array(1.0f, 0.0f)),
      (null.asInstanceOf[java.lang.Long], goodText.replace("fox", "owl"), Array(0.0f, 1.0f))
    ).toDF("doc_id", "text", "embedding")
    val prepared = Corpus.prepareFunnel(docs)
    val deduped = Corpus
      .semanticDedupStage(prepared, "embedding", threshold = 0.9, nlist = 1)
      .collect()
    assert(deduped.forall(_.getAs[String]("drop_reason") === "kept"),
      deduped.map(r => (r.get(0), r.getAs[String]("drop_reason"))).toSeq.toString)
    val bench = Seq((100L, Array(0.0f, 1.0f))).toDF("doc_id", "embedding")
    val decon = Corpus
      .semanticDecontaminationStage(prepared, bench, "embedding", threshold = 0.9)
      .collect()
    // the null-id row IS semantically near the bench vector, but
    // identity-based demotion cannot track it: documented pass-through
    val nullRow = decon.find(_.isNullAt(0)).get
    assert(nullRow.getAs[String]("drop_reason") === "kept")
  }

  test("a planted hot embedding cluster stays O(m) through the funnel's semantic stage") {
    // 5000 identical-embedding docs: uncapped, the within-cell join
    // would emit ~12.5M pairs; with the pipeline default cap the star
    // fallback emits m-1. Identical-content clusters collapse EXACTLY
    // (star semantics) — one survivor, min id wins.
    val m = 5000
    assert(m > graft.dedup.BucketJoin.PipelineDefaultCap)
    val rows = (0 until m).map(i => (i.toLong, Array(1.0f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = graft.similarity.Similarity
      .semanticDedupPairs(df, "vec_id", "embedding", threshold = 0.9,
        nlist = 1, bucketCap = graft.dedup.BucketJoin.PipelineDefaultCap)
    assert(pairs.count() === (m - 1).toLong, "hot cell must emit star pairs, not m^2")
    val survivors = graft.similarity.Similarity
      .semanticDedupSweep(df, "vec_id", "embedding", threshold = 0.9,
        nlist = 1, bucketCap = graft.dedup.BucketJoin.PipelineDefaultCap)
    assert(survivors.count() === 1L)
  }

  test("semantic decontamination stage demotes kept near-benchmark docs only") {
    val docs = Seq(
      (1L, goodText, Array(1.0f, 0.0f)), // semantically = benchmark
      (2L, goodText.replace("fox", "owl"), Array(0.0f, 1.0f)), // clean
      (3L, "short text only", Array(1.0f, 0.0f)) // rule-failed twin
    ).toDF("doc_id", "text", "embedding")
    val bench = Seq((100L, Array(0.999f, 0.01f))).toDF("doc_id", "embedding")
    val out = Corpus
      .semanticDecontaminationStage(
        Corpus.prepareFunnel(docs), bench, "embedding", threshold = 0.9)
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getAs[String]("drop_reason")).toSeq ===
      Seq("semantic_contaminated", "kept", "too_short"))
    assert(out.map(_.getAs[Boolean]("kept")).toSeq === Seq(false, true, false))
  }

  test("language gate fires for a rule-passing non-English document") {
    // German prose long enough and punctuation-free, with two English
    // stopwords planted so the gopher floor passes — the first failing
    // stage is then the language gate
    val deWords = Seq("der", "hund", "und", "die", "katze", "ist", "nicht",
      "mit", "sich", "auf", "ein", "haus")
    val deText = (Iterator.continually(deWords).flatten.take(58) ++ Iterator("the", "and"))
      .mkString(" ")
    val docs = Seq((1L, goodText), (2L, deText)).toDF("doc_id", "text")
    val out = Corpus.prepareFunnel(docs).orderBy("doc_id").collect()
    assert(out(1).getAs[String]("predicted") === "de")
    assert(out(1).getAs[String]("drop_reason") === "non_english")
  }

  test("duplicates keep the lowest surviving id; failed rows never claim the slot") {
    // doc 5 is a normalized duplicate of doc 1: trailing punctuation
    // disappears under fingerprint normalization but leaves every
    // scan-side rule passing (one extra short "token" barely moves the
    // ratios). doc 0 is unrelated and rule-dropped.
    val dupOfGood = goodText + " ..." // normalizes to the same fingerprint
    val docs = Seq(
      (0L, "the quick brown"), // too_short, different fingerprint
      (1L, goodText),
      (5L, dupOfGood)
    ).toDF("doc_id", "text")
    val out = Corpus.prepareFunnel(docs).orderBy("doc_id").collect()
    assert(out(1).getAs[String]("drop_reason") === "kept") // lowest surviving id wins
    assert(out(2).getAs[String]("drop_reason") === "duplicate")
  }

  test("a rule-failed copy does not shadow a clean duplicate with a higher id") {
    // doc 1 fails word_len? craft: identical normalized text, but doc 1
    // with symbols pushing symbol_ratio over the limit while doc 2 is
    // clean. fingerprint strips symbols, so both share a fingerprint;
    // doc 1 (lower id) is rule-dropped and doc 2 must stay kept.
    val noisy = goodText.split(" ").map(w => w + "!!!").mkString(" ")
    val docs = Seq((1L, noisy), (2L, goodText)).toDF("doc_id", "text")
    val out = Corpus.prepareFunnel(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("drop_reason") === "symbol_ratio")
    assert(out(1).getAs[String]("drop_reason") === "kept")
  }

  test("prepareFunnel carries the original columns — where(kept) IS the corpus") {
    val docs = Seq((1L, goodText, "web"), (2L, "short", "web"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.prepareFunnel(docs)
    assert(out.columns.toSeq ===
      Seq("doc_id", "text", "source", "predicted", "drop_reason", "kept"))
    val kept = out.where(col("kept")).select("doc_id", "text", "source").collect()
    assert(kept.map(r => (r.getLong(0), r.getString(2))).toSeq === Seq((1L, "web")))
  }

  test("funnelStats accounts every document exactly once") {
    val docs = Seq(
      (1L, goodText),
      (2L, goodText + " ..."),
      (3L, "short")
    ).toDF("doc_id", "text")
    val stats = Corpus
      .funnelStats(Corpus.prepareFunnel(docs))
      .as[(String, Long)]
      .collect()
      .toMap
    assert(stats === Map("kept" -> 1L, "duplicate" -> 1L, "too_short" -> 1L))
    // weighted variant: volume lost per stage in the weight column's units
    val weighted = Corpus
      .funnelStats(
        Corpus.prepareFunnel(docs).withColumn("n_chars", length($"text")),
        weightCol = Some("n_chars")
      )
      .as[(String, Long, Long)]
      .collect()
      .map(r => r._1 -> r._3)
      .toMap
    assert(weighted("too_short") === 5L) // "short"
    assert(weighted("duplicate") === goodText.length + 4L) // " ..." suffix
  }

  test("extraStages slot in after the built-in rules, first-failing, dedup-aware") {
    val docs = Seq(
      (1L, goodText, "good.example"),
      (2L, goodText + " ...", "spam.example"), // blocklisted AND a duplicate
      (3L, "short", "spam.example") // too_short fires before the blocklist
    ).toDF("doc_id", "text", "domain")
    val out = Corpus
      .prepareFunnel(
        docs,
        extraStages = Seq("blocklisted_domain" -> col("domain").endsWith("spam.example"))
      )
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getAs[String]("drop_reason")).toSeq ===
      Seq("kept", "blocklisted_domain", "too_short"))
  }

  test("predefined Stages compose: blocklist suffix match, PII digits, char budget") {
    val docs = Seq(
      (1L, goodText, "good.example"),
      (2L, goodText, "sub.spam.example"), // subdomain of a blocklisted suffix
      (3L, goodText + " 123456789", "good.example"), // 9-digit run
      (4L, goodText, "spamexample.com") // NOT a suffix match
    ).toDF("doc_id", "text", "domain")
    val out = Corpus
      .prepareFunnel(
        docs,
        extraStages = Seq(
          Corpus.Stages.blocklistedDomain(col("domain"), Seq("spam.example")),
          Corpus.Stages.piiDigits(col("text")),
          Corpus.Stages.maxChars(col("text"), max = 10000)
        )
      )
      .orderBy("doc_id")
      .collect()
      .map(_.getAs[String]("drop_reason"))
    // docs 1/2/4 share a fingerprint: 1 keeps the slot, 2 is
    // blocklisted first-failing, 4 (clean domain) dedups against 1
    assert(out.toSeq === Seq("kept", "blocklisted_domain", "pii_digits", "duplicate"))
  }

  test("repetition ceiling trips on looping text via the pre-projected tokens") {
    // looping doc passing every built-in rule (stopwords present, sane
    // word lengths): a 7-token loop -> dup bigram frac ~0.87
    val looping = Iterator.continually("the best cheap pills on sale now").take(8).mkString(" ")
    val docs = Seq((1L, goodText), (2L, looping)).toDF("doc_id", "text")
    val out = Corpus
      .prepareFunnel(
        docs,
        extraStages = Seq(Corpus.Stages.repetitionCeiling(col("_toks"), maxFrac = 0.5))
      )
      .orderBy("doc_id")
      .collect()
      .map(_.getAs[String]("drop_reason"))
    // goodText repeats a 12-word phrase 5x -> it is ALSO repetitive at
    // 0.5; use its reason to pin the threshold's bite instead
    assert(out(1) === "repetitive")
    // and _toks is not leaked into the output schema
    val cols = Corpus.prepareFunnel(docs).columns.toSeq
    assert(!cols.contains("_toks"))
  }

  test("custom language roster changes the gate, default unchanged") {
    val lists = Seq(
      "xx" -> Seq("zorp", "blee"),
      "en" -> graft.text.Text.stopwords("en")
    )
    val toks = graft.text.Text.tokens(col("text"))
    val docs = Seq(
      (1L, "zorp blee zorp blee zorp"),
      (2L, "the cat and the dog sat")
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), graft.text.Text.langIdFromTokens(toks, lists).as("p"))
      .orderBy("doc_id")
      .as[(Long, String)]
      .collect()
    assert(out.toSeq === Seq((1L, "xx"), (2L, "en")))
  }

  test("decontamination stage tags benchmark overlap and never claims the dedup slot") {
    // doc 2 embeds an 8-word benchmark span verbatim; doc 3 is a clean
    // normalized duplicate of doc 1
    val benchSpan = "alpha beta gamma delta epsilon zeta eta theta"
    val contaminatedText =
      goodText.split(" ").take(26).mkString(" ") + " " + benchSpan + " " +
        goodText.split(" ").drop(34).mkString(" ")
    val bench = Seq((100L, s"benchmark question about $benchSpan and more context here"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, goodText),
      (2L, contaminatedText),
      (3L, goodText + " ...")
    ).toDF("doc_id", "text")
    val out = Corpus
      .prepareFunnel(docs, decontaminateAgainst = Some(bench), spanWords = 8)
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getAs[String]("drop_reason")).toSeq ===
      Seq("kept", "contaminated", "duplicate"))

    // a contaminated EXACT DUPLICATE must not shadow the clean copy:
    // doc 1 (clean, higher id than the contaminated 0) stays kept
    val docs2 = Seq(
      (0L, contaminatedText),
      (1L, contaminatedText) // same fingerprint, also contaminated
    ).toDF("doc_id", "text")
    val out2 = Corpus
      .prepareFunnel(docs2, decontaminateAgainst = Some(bench), spanWords = 8)
      .orderBy("doc_id")
      .collect()
    // both contaminated — neither survives, neither is "duplicate"
    assert(out2.map(_.getAs[String]("drop_reason")).toSeq ===
      Seq("contaminated", "contaminated"))
  }

  test("mixtureSample follows the target mixture and caps under-supplied domains") {
    val docs = (1 to 1000)
      .map(i => (i.toLong, if (i <= 800) "web" else if (i <= 990) "books" else "code"))
      .toDF("doc_id", "source")
    val out = Corpus
      .mixtureSample(docs, "doc_id", "source",
        Seq("web" -> 0.5, "books" -> 0.25, "code" -> 0.25), budget = 200L)
      .groupBy("source")
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    // web: f = 100/800 = 0.125 -> ~100; books: 50/190 -> ~50;
    // code under-supplied: f = 50/10 capped at 1 -> exactly all 10
    assert(out("code") === 10L)
    assert(math.abs(out("web") - 100L) < 30, s"web=${out("web")}")
    assert(math.abs(out("books") - 50L) < 25, s"books=${out("books")}")
  }

  test("a trained classifier score slots into the funnel as an extraStages cut") {
    // train on the corpus' own weak labels, then gate the funnel on the
    // model's score — the CCNet end-to-end: classifier AS a pipeline
    // stage, with first-failing accounting intact
    import graft.ml.Logit
    // every doc passes the rule + language stages (en-stopword-rich,
    // well over the word floor); the ONLY difference is length, which
    // the classifier learns and the extra stage cuts on
    val unit = "the quick brown foxes jump over the lazy dogs while many people watch with great interest today "
    val docs = (1 to 40)
      .map { i =>
        val reps = if (i % 2 == 0) 4 else 8 // ~65 vs ~129 tokens, both past the rule floor; balanced classes keep the 0.5 cut between the two scores
        (i.toLong, (unit * reps) + s"doc$i")
      }
      .toDF("doc_id", "text")
    val x1 = graft.functions.round6(
      least(graft.text.Text.tokenCount(col("text")).cast("double") / 120.0, lit(1.0))
    )
    val feats = docs.select(
      col("doc_id"),
      when(graft.text.Text.tokenCount(col("text")) > 100, 1.0).otherwise(0.0).as("label"),
      x1.as("x1")
    )
    val m = Logit.fit(feats, "label", Seq("x1"), iters = 20, lr = 5.0)
    // the score expression computes over the raw frame scan-side (x1
    // rebuilt from text) — no join back to the training frame
    val scoreExpr = Logit.score(m.weights, Seq("x1"))
    val out = Corpus
      .prepareFunnel(
        docs.withColumn("x1", x1),
        extraStages = Seq("classifier_low_quality" -> (scoreExpr < 0.5))
      )
      .orderBy("doc_id")
      .collect()
    val shortDocs = out.filter(_.getAs[Long]("doc_id") % 2 == 0)
    val longDocs = out.filter(_.getAs[Long]("doc_id") % 2 != 0)
    assert(shortDocs.nonEmpty && shortDocs.forall(r =>
      !r.getAs[Boolean]("kept") &&
        r.getAs[String]("drop_reason") == "classifier_low_quality"))
    // long docs survive the classifier; only the funnel's own dedup may
    // demote them (near-identical repeated text), never the new stage
    assert(longDocs.forall(r =>
      r.getAs[String]("drop_reason") != "classifier_low_quality"))
  }

  test("mixtureTemperature flattens domain skew toward uniform as tau drops") {
    // 900/100 split: natural (tau=1) keeps ~9:1, tau=0.5 shifts the
    // mixture toward the small domain (w = sqrt(n) normalized:
    // f_big = 200*0.75/900 = 0.1667, f_small = 200*0.25/100 = 0.5)
    val docs = (1 to 1000)
      .map(i => (i.toLong, if (i <= 900) "web" else "code"))
      .toDF("doc_id", "source")
    def keeps(tau: Double): Map[String, Long] =
      Corpus
        .mixtureTemperature(docs, "doc_id", "source", tau, budget = 200L)
        .groupBy("source")
        .count()
        .as[(String, Long)]
        .collect()
        .toMap
    val natural = keeps(1.0)
    val cooled = keeps(0.5)
    // tau=1: every domain keeps the SAME fraction (budget/N = 0.2)
    assert(math.abs(natural("web") - 180L) < 40, s"web=${natural("web")}")
    assert(math.abs(natural("code") - 20L) < 15, s"code=${natural("code")}")
    // tau=0.5: the small domain's share rises ~2.5x, the big one's falls
    assert(cooled("code") > natural("code"))
    assert(cooled("web") < natural("web"))
    assert(math.abs(cooled("code") - 50L) < 20, s"code=${cooled("code")}")
    // budget-monotone + deterministic, like the share-list variant
    val small = Corpus
      .mixtureTemperature(docs, "doc_id", "source", 0.5, budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    val large = Corpus
      .mixtureTemperature(docs, "doc_id", "source", 0.5, budget = 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    val again = Corpus
      .mixtureTemperature(docs.repartition(7), "doc_id", "source", 0.5, budget = 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(again === large)
    intercept[IllegalArgumentException](
      Corpus.mixtureTemperature(docs, "doc_id", "source", 1.5, 10L)
    )
  }

  test("mixtureTemperature treats a NULL stratum as its own domain, never drops it") {
    // 400 web / 100 unlabeled: the NULL stratum must get a threshold
    // row through the null-safe join and be sampled by its own count —
    // an equi-join would silently erase all 100 from the sample
    val docs = (1 to 500)
      .map(i => (i.toLong, if (i <= 400) Some("web") else None))
      .toDF("doc_id", "source")
    val kept = Corpus
      .mixtureTemperature(docs, "doc_id", "source", 1.0, budget = 250L)
      .groupBy("source")
      .count()
      .collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
      .toMap
    // tau=1: both strata keep the same ~budget/N = 0.5 fraction
    assert(kept.contains(None), s"NULL stratum vanished from the sample: $kept")
    assert(math.abs(kept(None) - 50L) < 25, s"null-stratum kept=${kept(None)}")
    assert(math.abs(kept(Some("web")) - 200L) < 50)
    // and the sampled frame still carries the original columns only
    val cols = Corpus
      .mixtureTemperature(docs, "doc_id", "source", 1.0, budget = 250L)
      .columns
      .toSeq
    assert(cols == Seq("doc_id", "source"), cols.toString)
  }

  test("mixtureSample is deterministic and budget-monotone (prefix property)") {
    val docs = (1 to 500)
      .map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val weights = Seq("a" -> 0.5, "b" -> 0.5)
    def ids(budget: Long): Set[Long] =
      Corpus
        .mixtureSample(docs, "doc_id", "source", weights, budget)
        .select("doc_id")
        .as[Long]
        .collect()
        .toSet
    val small = ids(100L)
    assert(ids(100L) === small, "same budget must redraw the identical sample")
    assert(small.subsetOf(ids(200L)), "raising the budget must only add rows")
  }

  test("domains absent from the weights are dropped entirely") {
    val docs = (1 to 100)
      .map(i => (i.toLong, if (i % 2 == 0) "keep" else "junk"))
      .toDF("doc_id", "source")
    val out = Corpus
      .mixtureSample(docs, "doc_id", "source", Seq("keep" -> 1.0), budget = 100L)
      .select(collect_set("source"))
      .as[Seq[String]]
      .head()
    assert(out === Seq("keep"))
  }

  test("mixtureSampleByWeight hits the budget share in weight units, not rows") {
    // domain "long" has few huge docs, "short" many tiny ones: a
    // 50/50 ROW draw would be weight-lopsided; the weight-budget draw
    // must split the weight mass evenly instead
    val docs = ((1 to 100).map(i => (i.toLong, "long", 1000L)) ++
      (101 to 1100).map(i => (i.toLong, "short", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val out = Corpus
      .mixtureSampleByWeight(docs, "doc_id", "source", "n_tok",
        Seq("long" -> 0.5, "short" -> 0.5), budget = 10000L)
      .groupBy("source")
      .agg(sum("n_tok").as("w"))
      .as[(String, Long)]
      .collect()
      .toMap
    // each domain targets 5000 weight units (f: long 5000/100000 = 0.05,
    // short 5000/10000 = 0.5); hash draw concentrates around the target
    assert(math.abs(out("long") - 5000L) < 3000, s"long=${out("long")}")
    assert(math.abs(out("short") - 5000L) < 2000, s"short=${out("short")}")
    // an all-zero-weight domain is dropped rather than divided by zero
    val zeroed = ((1 to 10).map(i => (i.toLong, "z", 0L)) ++
      (11 to 20).map(i => (i.toLong, "a", 5L))).toDF("doc_id", "source", "n_tok")
    val kept = Corpus
      .mixtureSampleByWeight(zeroed, "doc_id", "source", "n_tok",
        Seq("z" -> 0.5, "a" -> 0.5), budget = 100L)
      .select(collect_set("source")).as[Seq[String]].head()
    assert(kept === Seq("a"))
  }

  test("qualityCut keeps each group's own top fraction") {
    // group a scores 1..100, group b scores 1001..1100: a global cut
    // at 50% would drop ALL of a; the per-group cut keeps each top half
    val docs = ((1 to 100).map(i => (i.toLong, "a", i.toDouble)) ++
      (1 to 100).map(i => (100L + i, "b", 1000.0 + i)))
      .toDF("doc_id", "grp", "score")
    val out = Corpus
      .qualityCut(docs, "score", keepTop = 0.5, groupCols = Seq("grp"))
      .groupBy("grp")
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    // 50th percentile of 1..100 is 50.5; >= keeps 51..100
    assert(out === Map("a" -> 50L, "b" -> 50L))
    val global = Corpus.qualityCut(docs, "score", keepTop = 0.5)
    assert(global.where($"grp" === "a").count() === 0L)
    // NULL scores never pass, even at keepTop = 1.0
    val withNull = Seq[(Long, String, java.lang.Double)](
      (1L, "a", 5.0),
      (2L, "a", null)
    ).toDF("doc_id", "grp", "score")
    val kept = Corpus
      .qualityCut(withNull, "score", keepTop = 1.0, groupCols = Seq("grp"))
      .select("doc_id")
      .as[Long]
      .collect()
    assert(kept.toSeq === Seq(1L))
    intercept[IllegalArgumentException] {
      Corpus.qualityCut(docs, "score", keepTop = 0.0)
    }
    // a NULL GROUP is its own stratum with its own cut — a null-unsafe
    // equi-join would silently delete every NULL-group row regardless
    // of score (the mixtureTemperature convention)
    val withNullGrp = ((1 to 10).map(i => (i.toLong, Option("a"), i.toDouble)) ++
      (1 to 10).map(i => (10L + i, Option.empty[String], 100.0 + i)))
      .toDF("doc_id", "grp", "score")
    val byGrp = Corpus
      .qualityCut(withNullGrp, "score", keepTop = 0.5, groupCols = Seq("grp"))
      .groupBy("grp")
      .count()
      .collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1))
      .toMap
    assert(byGrp === Map(Some("a") -> 5L, None -> 5L))
  }

  test("mixtureSampleByWeight keeps domains with fractional sub-1 weights") {
    // weights averaging 0.4 per row: a per-row DECIMAL(38,0) cast
    // would round every one to 0, zero the domain's weight sum, and
    // silently drop the WHOLE domain from the sample
    val docs = ((1 to 50).map(i => (i.toLong, "web", 0.4)) ++
      (1 to 50).map(i => (100L + i, "code", 0.4)))
      .toDF("doc_id", "source", "w")
    val out = Corpus
      .mixtureSampleByWeight(
        docs, "doc_id", "source", "w",
        weights = Seq("web" -> 0.5, "code" -> 0.5),
        budget = 10L
      )
      .groupBy("source")
      .count()
      .as[(String, Long)]
      .collect()
      .toMap
    // budget 10 weight units at 0.4/row → f = min(1, 5/20) per domain:
    // both domains present, each around a quarter of its rows
    assert(out.keySet === Set("web", "code"))
    assert(out.values.forall(n => n > 0 && n < 50))
  }

  test("mixtureSample validates weights and budget") {
    val docs = Seq((1L, "a")).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Corpus.mixtureSample(docs, "doc_id", "source", Seq("a" -> 0.5), 10L)
    }
    intercept[IllegalArgumentException] {
      Corpus.mixtureSample(docs, "doc_id", "source", Seq("a" -> 1.0), 0L)
    }
  }

  test("prepareFunnel shuffles exactly once — the fingerprint exchange") {
    // the whole funnel must be scan-side projection + ONE hash
    // exchange on the fingerprint for the dedup window; a second real
    // exchange would mean per-stage jobs crept back in
    val docs = (1 to 50)
      .map(i => (i.toLong, if (i % 7 == 0) goodText else s"$goodText extra token$i"))
      .toDF("doc_id", "text")
    val funnel = Corpus.prepareFunnel(docs)
    assert(funnel.collect().nonEmpty)
    val finalPlan = funnel.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val real = finalPlan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("ReusedExchange"))
      .toSeq
    assert(real.size == 1, s"expected one exchange, got ${real.size}:\n${real.mkString("\n")}")
    assert(real.head.contains("_fp"), s"the single exchange must be the fingerprint shuffle: ${real.head}")
    // the shuffle must not carry the document-sized token array: the
    // dedup window's input attribute set IS what the fingerprint
    // exchange ships (exchanges are only materialized at execution, so
    // inspect the window node in the physical plan)
    val wins = funnel.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "no window node in the physical plan")
    wins.foreach { w =>
      assert(
        !w.child.output.map(_.name).contains("_toks"),
        s"token array rides the fingerprint shuffle: ${w.child.output.map(_.name)}"
      )
    }
  }

  test("firstFailing returns NULL for rows passing every stage") {
    val df = Seq((1, 10), (2, 200), (3, -5)).toDF("id", "v")
    val reason = Corpus.firstFailing(
      Seq("negative" -> (col("v") < 0), "too_big" -> (col("v") > 100))
    )
    val out = df.select(col("id"), reason.as("r")).orderBy("id").as[(Int, Option[String])].collect()
    assert(out === Array((1, None), (2, Some("too_big")), (3, Some("negative"))))
  }
}
