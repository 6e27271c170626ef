package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("v")).collect().head.get(0)

  test("token counts: whitespace and BPE-ish") {
    assert(one(Text.tokenCount($"t"), "the cat sat") == 3)
    assert(one(Text.bpeTokenCount($"t"), "abc123 def!") == 4) // abc,123,def,!
  }

  test("normalize strips punctuation, case, extra whitespace") {
    assert(one(Text.normalize($"t"), "Hello,   World!!") == "hello world")
  }

  test("fingerprint equals md5 of normalized text and collapses variants") {
    val f1 = one(Text.fingerprint($"t"), "Hello, World!")
    val f2 = one(Text.fingerprint($"t"), "hello world")
    assert(f1 == f2)
  }

  test("language id picks the dominant stopword language, und when none") {
    assert(one(Text.langId($"t"), "the cat is on the mat") == "en")
    assert(one(Text.langId($"t"), "der hund ist nicht auf der couch") == "de")
    assert(one(Text.langId($"t"), "le chat est dans la maison") == "fr")
    assert(one(Text.langId($"t"), "el gato es un animal") == "es")
    assert(one(Text.langId($"t"), "zzz qqq xxx") == "und")
  }

  test("word shingles and jaccard") {
    val sh = one(Text.wordShingles($"t", 2), "a b c").asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSeq == Seq("a b", "b c"))
    val j = Seq(("a b c d", "a b c e"))
      .toDF("x", "y")
      .select(Text.jaccard(Text.wordShingles($"x", 2), Text.wordShingles($"y", 2)).as("j"))
      .collect()
      .head
      .getDouble(0)
    // shingles x: {a b, b c, c d}; y: {a b, b c, c e}; intersect 2, union 4
    assert(math.abs(j - 0.5) < 1e-9)
  }

  test("shingle hashes from token hashes mirror wordShingles cardinality") {
    val df = Seq("one two three four", "a b").toDF("t")
    val out = df
      .select(Text.tokenHashes($"t").as("th"), Text.wordShingles($"t", 3).as("ws"))
      .select(size(Text.shingleHashesFromTokenHashes($"th", 3)).as("nh"), size($"ws").as("nw"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("tf-idf surfaces rare terms over ubiquitous ones") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the bird flew over the zephyr")
    ).toDF("doc_id", "text")
    val top = Text
      .tfIdfTopK(docs, "text", "doc_id", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // "the" appears in every doc (df=3, N=3) -> heavily down-weighted;
    // each doc's top terms must be its distinctive words
    assert(!top.exists(_._2 == "the"))
    assert(top.filter(_._1 == 3L).map(_._2).toSet.subsetOf(Set("bird", "flew", "zephyr")))
    // rank is deterministic: score desc then term asc
    val r3 = Text.tfIdfTopK(docs, "text", "doc_id", k = 2).where($"id" === 3L)
      .orderBy("rank").select("term").as[String].collect()
    assert(r3.sameElements(Text.tfIdfTopK(docs, "text", "doc_id", k = 2).where($"id" === 3L)
      .orderBy("rank").select("term").as[String].collect()))
  }

  test("repetition signals match hand-computed values") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "x y x y x y")
    ).toDF("doc_id", "text")
    val got = Text
      .repetitionSignals(docs, "text", "doc_id")
      .orderBy("id")
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // doc 1: tokens a,a,b -> distinct 2/3, top 2/3; bigrams "a a","a b"
    // both unique -> 0; single trigram -> 0
    assert(got(0) == ((1L, 3L, 0.666667, 0.666667, 0.0, 0.0)))
    // doc 2: 6 tokens of 2 kinds -> distinct 1/3, top 1/2; all 5 bigram
    // occurrences are repeats -> 1.0; trigrams "x y x" x2 + "y x y" x2,
    // 4 occurrences x 5 chars = 20 over 11 chars -> 1.818182 (>1 by
    // design: overlapping occurrences both count)
    assert(got(1) == ((2L, 6L, 0.333333, 0.5, 1.0, 1.818182)))
  }

  test("redaction scrubs emails, phones, ips and digit runs in pattern order") {
    val got = one(
      Text.redact($"t"),
      "mail john.doe@example.com or +1 (555) 123-4567, host 10.0.0.1, id 42"
    )
    assert(got == "mail [EMAIL] or [PHONE], host [IP], id [NUMBER]")
    val counts = Seq("a@b.io c@d.io none")
      .toDF("t")
      .select(Text.redactionCount($"t", Text.redactionPatterns.head._2).as("n"))
      .collect()
      .head
      .getInt(0)
    assert(counts == 2)
  }

  test("gopher filter: first failing rule wins in fixed order, prose passes") {
    def reason(t: String, minWords: Int = 5): String =
      Seq(t)
        .toDF("t")
        .select(Text.gopherReason($"t", minWords = minWords).as("r"))
        .collect()
        .head
        .getString(0)
    // too_short fires before few_stopwords even though both fail
    assert(reason("zzz qqq") == "too_short")
    // length passes, mean word length out of [3,10] range
    assert(reason("aa bb cc dd ee ff") == "word_len")
    // symbol_ratio fires before few_stopwords (evaluation order)
    assert(reason("@#$%! ^&*() ~~~+= [][] {}{}") == "symbol_ratio")
    // word-len ok, no english stopwords
    assert(reason("gato perro casa mesa silla libro") == "few_stopwords")
    assert(reason("the cat sat on the mat with all of them") == "ok")
  }

  test("quality heuristics are mixed-case-safe on raw crawl text") {
    // Ordinarily capitalized prose: letters must NOT count as symbols,
    // and "The" must hit the English stopword list — pre-fix, this
    // sentence was mass-rejected by the symbol_ratio rule.
    val prose = "The quick brown Fox jumps over the lazy Dog and then " +
      "The Fox runs far away into the deep Forest with all of its kin " +
      "while the Dog sits by the old barn and waits for the long day " +
      "to end as the sun falls below the far hills of the green land"
    assert(one(Text.gopherReason($"t"), prose) == "ok")
    // punctRatio: only true symbols count, case-blind
    val pr = one(Text.punctRatio($"t"), "The cat!").asInstanceOf[Double]
    assert(math.abs(pr - 1.0 / 8.0) < 1e-9) // '!' alone over 8 chars
    // stopwordRatio: "The" and "THE" both hit the lowercase list
    val swr = one(Text.stopwordRatio($"t"), "The THE zzz").asInstanceOf[Double]
    assert(math.abs(swr - 2.0 / 3.0) < 1e-9)
    // langId sees capitalized stopwords too
    assert(one(Text.langId($"t"), "The Cat Is On The Mat") == "en")
    // identical text differing only in case gets identical quality
    val qs = Seq("the cat is on the mat", "The Cat Is On The Mat")
      .toDF("t").select(Text.qualityScore($"t").as("q"))
      .collect().map(_.getDouble(0))
    assert(qs(0) === qs(1))
  }

  test("quality score is in [0,1] and favors prose over symbol soup") {
    val q = Seq("the cat is on the mat and it is a fine day for all of us", "@#$% ^&*! ~~~")
      .toDF("t")
      .select(Text.qualityScore($"t").as("q"))
      .collect()
      .map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("unigram log-prob ranks gibberish below common prose, exactly as computed by hand") {
    // corpus: "the cat" twice, "zq wx" once. Counts: the=2, cat=2,
    // zq=1, wx=1, total=6. Prose docs: avg ln(2/6); gibberish doc:
    // avg ln(1/6).
    val docs = Seq((1L, "the cat"), (2L, "The cat!"), (3L, "zq wx"))
      .toDF("doc_id", "text")
    val out = Text.unigramLogProb(docs, "text", "doc_id")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("n_terms")).toSeq === Seq(2L, 2L, 2L))
    val scores = out.map(_.getAs[Double]("avg_logprob"))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(scores(0) === scores(1)) // normalization: case + punct
    assert(math.abs(scores(0) - r6(math.log(2.0 / 6.0))) < 2e-6)
    assert(math.abs(scores(2) - r6(math.log(1.0 / 6.0))) < 2e-6)
    assert(scores(2) < scores(0), "rare-token doc must score below prose")
    // a doc that normalizes to zero tokens returns (0, NULL) instead
    // of vanishing from the output (the bigramLogProb convention)
    val withEmpty = docs.union(Seq((4L, "!!! ???")).toDF("doc_id", "text"))
    val all = Text.unigramLogProb(withEmpty, "text", "doc_id")
      .orderBy("id").collect()
    assert(all.length == 4)
    assert(all(3).getAs[Long]("n_terms") == 0L && all(3).isNullAt(2))
  }

  test("chunking: overlap, short docs, and fully-covered tails by hand") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Text
      .chunk(docs, "text", "doc_id", window = 3, overlap = 1)
      .orderBy("id", "chunk_no")
      .as[(Long, Int, Int, Int, String)]
      .collect()
      .toSeq
    assert(
      got === Seq(
        // start 6 is dropped: "g" is already covered by the chunk at 4
        (1L, 0, 0, 3, "a b c"),
        (1L, 1, 2, 3, "c d e"),
        (1L, 2, 4, 3, "e f g"),
        (2L, 0, 0, 1, "x"),
        (3L, 0, 0, 3, "a b c"),
        (3L, 1, 2, 2, "c d")
      )
    )
  }

  test("chunking with zero overlap tiles the document exactly") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Text
      .chunk(docs, "text", "doc_id", window = 2, overlap = 0)
      .orderBy("chunk_no")
      .as[(Long, Int, Int, Int, String)]
      .collect()
      .toSeq
    assert(got.map(_._5) === Seq("a b", "c d", "e"))
    assert(got.map(_._4).sum == 5, "zero overlap partitions every token once")
  }

  test("pmi bigrams: hand-computed ratios, deterministic tie-break") {
    // unigrams a:3 b:2 c:1 (N=6); bigrams (a,b):2 (b,a):1 (a,c):1 (M=4)
    // score(a,b) = 2*36/(4*3*2) = 3.0, (a,c) = 36/12 = 3.0, (b,a) = 1.5
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Text
      .pmiBigrams(docs, "text", minCount = 1, k = 10)
      .orderBy("rank")
      .as[(String, String, Long, Double, Int)]
      .collect()
      .toSeq
    assert(
      got === Seq(
        ("a", "b", 2L, 3.0, 1), // tie with (a,c) broken lexicographically
        ("a", "c", 1L, 3.0, 2),
        ("b", "a", 1L, 1.5, 3)
      )
    )
  }

  test("pmi minCount floor drops rare pairs; single-token docs contribute none") {
    val docs = Seq((1L, "x y x y x y"), (2L, "z"), (3L, "q r")).toDF("doc_id", "text")
    val got = Text
      .pmiBigrams(docs, "text", minCount = 2, k = 10)
      .as[(String, String, Long, Double, Int)]
      .collect()
    assert(got.forall(_._3 >= 2))
    assert(!got.exists(p => p._1 == "q" || p._1 == "z"))
  }

  test("bm25 matches the hand-computed Robertson formula") {
    // N=3, dl = 2/3/1, avgdl = 2. Query "apple": df=2,
    // idf = (3-2+0.5)/(2+0.5) = 0.6.
    // doc1 tf=1: 2.2/(1+1.2*(0.25+0.75*2/2)) = 1.0    -> 0.6
    // doc2 tf=2: 4.4/(2+1.2*(0.25+0.75*3/2))          -> 0.723288
    // doc3: no match, absent from output.
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple apple banana"),
      (3L, "cherry")
    ).toDF("doc_id", "text")
    val out = Text
      .bm25Score(docs, "text", "doc_id", Seq("apple"))
      .orderBy("id")
      .collect()
    assert(out.length == 2, "non-matching docs are absent")
    assert(out.map(_.getAs[Long]("n_matched")).toSeq === Seq(1L, 1L))
    val s = out.map(_.getAs[Double]("score"))
    assert(math.abs(s(0) - 0.6) < 1e-9)
    assert(math.abs(s(1) - 0.723288) < 1e-6)
    assert(s(1) > s(0), "higher tf must score higher at equal length class")
    // query terms get the indexed terms' normalization — a raw
    // "Apple!" must match the same documents as "apple" (pre-fix the
    // verbatim isin matched zero docs and returned empty, silently)
    val rawQuery = Text
      .bm25Score(docs, "text", "doc_id", Seq("Apple!"))
      .orderBy("id")
      .collect()
    assert(rawQuery.map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq ==
      out.map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq)
    intercept[IllegalArgumentException](
      Text.bm25Score(docs, "text", "doc_id", Seq("!!!")))
  }

  test("readability: empty and blank documents emit NULL flesch, not the top score") {
    // split("", " ") is [""]; a raw token count would give empty docs
    // n_words = 1 and flesch ~205.8 — the HIGHEST score in the corpus,
    // inverting curriculum order
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, ""),
      (3L, "   ")
    ).toDF("doc_id", "text")
    val out = Text.readability(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_words") == 6 && !out(0).isNullAt(4))
    assert(out(1).getAs[Int]("n_words") == 0 && out(1).isNullAt(4))
    assert(out(2).getAs[Int]("n_words") == 0 && out(2).isNullAt(4))
  }

  test("bm25 favors rarer query terms and length-normalizes") {
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common other"),
      (3L, "common stuff here"),
      (4L, "common filler words again and again and again padding")
    ).toDF("doc_id", "text")
    val out = Text
      .bm25Score(docs, "text", "doc_id", Seq("common", "rare"))
      .orderBy("id")
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("score"))
      .toMap
    // doc1 matches both terms; rare has df=1 -> much higher idf
    assert(out(1L) > 2 * out(2L))
    // same tf of "common" but longer doc -> lower normalized score
    assert(out(2L) > out(3L) && out(3L) > out(4L))
  }

  /** Plain-JVM reference BPE (the sequential algorithm from Sennrich
    * et al. 2016, deterministic tie-break count desc then (l, r) asc)
    * — the exactness oracle for the distributed trainer.
    */
  private def referenceBpe(
      texts: Seq[String],
      numMerges: Int,
      minPairCount: Long
  ): Seq[(Int, String, String, Long)] = {
    def norm(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    var words: Map[Vector[String], Long] = texts
      .flatMap(t => norm(t).split(" ").filter(_.nonEmpty))
      .groupBy(identity)
      .map { case (w, ws) =>
        (w.toVector.map(_.toString) :+ "</w>") -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var stop = false
    while (rank <= numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), k) => (-k, a, b) }
        if (c < minPairCount) stop = true
        else {
          out += ((rank, l, r, c))
          words = words.map { case (syms, n) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.result() -> n
          }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain reproduces the sequential reference BPE exactly") {
    // hand corpus with known first merges: 'low' x5, 'lower' x2,
    // 'newest' x6, 'widest' x3 (the Sennrich paper's example shape)
    val texts =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = Text.bpeTrain(df, "text", numMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val ref = referenceBpe(texts, 8, 2L)
    assert(got == ref, s"\ngot $got\nref $ref")
    // first merge on this corpus: (e, s) with count 9 (newest+widest)
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    // randomized corpora: distributed == sequential, including ties
    val rnd = new scala.util.Random(11)
    val vocabChars = "abcd"
    val docs = (0 until 40).map { i =>
      (0 until (2 + rnd.nextInt(4)))
        .map(_ => (0 until (1 + rnd.nextInt(5)))
          .map(_ => vocabChars(rnd.nextInt(vocabChars.length))).mkString)
        .mkString(" ")
    }
    val got2 = Text
      .bpeTrain(docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text"), "text", numMerges = 12, minPairCount = 3L)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got2 == referenceBpe(docs, 12, 3L))
    // early stop: a corpus where every pair is unique stops before the
    // requested merge count
    val sparse = Seq((1L, "ab cd ef")).toDF("id", "text")
    assert(Text.bpeTrain(sparse, "text", numMerges = 5, minPairCount = 2L).count() == 0)
  }

  test("bigram log-prob: interpolated model computed by hand; sub-2-token docs keep a NULL row") {
    // Corpus: doc1 "a b a b", doc2 "a b", doc3 "c", doc4 "b c".
    // Bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; contexts a·=3, b·=2.
    // Unigrams: a=3, b=4, c=2, total=9.
    val docs = Seq((1L, "a b a b"), (2L, "A b!"), (3L, "c"), (4L, "b c"))
      .toDF("doc_id", "text")
    val out = Text
      .bigramLogProb(docs, "text", "doc_id", lambda = 0.7)
      .orderBy("id")
      .collect()
    assert(out.map(_.getAs[Long]("n_bigrams")).toSeq === Seq(3L, 1L, 0L, 1L))
    assert(out(2).isNullAt(2), "1-token doc must emit NULL score, not vanish")
    val lpAB = math.log(0.7 * 3.0 / 3.0 + 0.3 * 4.0 / 9.0)
    val lpBA = math.log(0.7 * 1.0 / 2.0 + 0.3 * 3.0 / 9.0)
    val lpBC = math.log(0.7 * 1.0 / 2.0 + 0.3 * 2.0 / 9.0)
    val s = out.map(r => if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
    assert(math.abs(s(0) - (2 * lpAB + lpBA) / 3.0) < 2e-6)
    assert(math.abs(s(1) - lpAB) < 2e-6)
    assert(math.abs(s(3) - lpBC) < 2e-6)
    // the fluency property: a doc of common words in a NEVER-seen
    // transition order scores below one using the corpus's transitions
    assert(s(3) < s(1), "rarer transition must score below the common one")
  }

  test("DSIR log-weights: target-like docs outweigh off-target ones; featureless docs keep NULL rows") {
    // Target docs share "good stuff" bigrams, off-target share "bad
    // junk"; a mixed doc sits between. Weights are relative to the
    // pool, so target-distinctive features must push weight up.
    val docs = (
      (1 to 10).map(i => (i.toLong, "good stuff here really good stuff", true)) ++
        (11 to 20).map(i => (i.toLong, "bad junk there really bad junk", false)) ++
        Seq((21L, "good stuff really bad junk", false), (22L, "solo", false))
    ).toDF("doc_id", "text", "is_tgt")
    val out = Text
      .dsirLogWeights(docs, "text", "doc_id", isTarget = col("is_tgt"), buckets = 4096)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_feats"), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    assert(out(22L)._1 == 0L && out(22L)._2.isNaN,
      "1-token doc: n_feats 0, NULL weight")
    val tgtW = (1 to 10).map(i => out(i.toLong)._2)
    val offW = (11 to 20).map(i => out(i.toLong)._2)
    assert(tgtW.min > offW.max,
      s"every target doc must outweigh every off-target doc: $tgtW vs $offW")
    assert(out(21L)._2 > offW.max && out(21L)._2 < tgtW.min,
      "mixed doc sits strictly between the pure populations")
    // partitioning invariance: DECIMAL contribution sums make the
    // score a pure function of the data
    val re = Text
      .dsirLogWeights(docs.repartition(7), "text", "doc_id", col("is_tgt"), 4096)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.get(2))
      .toMap
    assert((1 to 22).forall(i => re(i.toLong) == out(i.toLong)._2 ||
      (re(i.toLong) == null && out(i.toLong)._2.isNaN)))
  }

  test("canonicalizeUrl folds case/ports/params/fragments into one dedup key") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "HTTPS://Example.COM:443/Path/x/?utm_source=a&b=2&a=1#frag"),
      (2L, "https://example.com/Path/x?a=1&b=2"), // same page, already canonical
      (3L, "http://site.org:8080/a?z=9&ref=abc"), // non-default port kept
      (4L, "http://host.net:80?fbclid=1"), // empty path -> root, all params dropped
      (5L, "ftp://Files.example.org/pub/"), // non-http scheme: generic rules only
      (6L, "not a url at all")
    ).toDF("id", "u")
    val got = rows
      .select(col("id"), graft.text.Text.canonicalizeUrl(col("u")).as("c"))
      .orderBy("id")
      .collect()
      .map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(got(0) == "https://example.com/Path/x?a=1&b=2")
    assert(got(0) == got(1)) // the two spellings collapse to ONE key
    assert(got(2) == "http://site.org:8080/a?z=9")
    // leading-zero ports fold numerically: ':080' IS the default port
    val zeroPort = Seq((1L, "http://a.com:080/x"), (2L, "http://a.com:0443/x"))
      .toDF("id", "u")
      .select(graft.text.Text.canonicalizeUrl(col("u")).as("c"))
      .orderBy("c")
      .collect()
      .map(_.getString(0))
    assert(zeroPort.toSeq == Seq("http://a.com/x", "http://a.com:443/x"))
    assert(got(3) == "http://host.net/")
    assert(got(4) == "ftp://files.example.org/pub")
    assert(got(5) == null)
    // idempotence: canonicalizing a canonical URL is a no-op
    val again = rows
      .select(graft.text.Text.canonicalizeUrl(
        graft.text.Text.canonicalizeUrl(col("u"))).as("c"))
      .orderBy(col("c"))
      .collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(again.toSet == got.toSet)
  }
}
