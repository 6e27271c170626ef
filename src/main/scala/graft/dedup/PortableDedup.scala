package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-portable near-dup signatures (SURVEY §2.4).
  *
  * The default dedup family ([[Dedup]]) computes signatures with
  * XXH64 kernels — the throughput path, but engine-specific: no other
  * SQL engine reproduces Spark's XXH64, so those queries cannot be
  * oracle-checked. This family derives every signature from `md5`,
  * which Spark and DuckDB (and Postgres, Trino, ...) implement
  * identically over UTF-8 bytes with lowercase-hex output — so the
  * ENTIRE pipeline (signatures, LSH bands, candidate pairs, sweeps) is
  * reproducible as portable SQL and sits under the driver's
  * hash-compare oracle gate.
  *
  *  - MinHash slot k = min over shingles of md5("k:" ++ shingle); the
  *    min is lexicographic over fixed-width hex strings == numeric min
  *    of the 128-bit values, so it is a valid uniform MinHash family.
  *  - SimHash uses the first 60 bits (15 hex nibbles) of md5(token) —
  *    60 instead of 64 keeps the packed signature inside a positive
  *    BIGINT on engines without unsigned 64-bit types.
  *
  * Scale shape is the same as [[Dedup]]: signatures are per-row
  * projections or one partial-aggregatable groupBy, the only wide
  * shuffle is keyed on compact band/chunk keys, and pairwise work
  * happens only within buckets. md5 costs ~3-5x an XXH64 kernel per
  * shingle — use [[Dedup]] when raw throughput matters and this family
  * when cross-engine verifiability does.
  */
object PortableDedup {

  /** `(id, shingle)` rows: space-split tokens, `n`-token shingles
    * joined with single spaces. Documents with fewer than `n` tokens
    * produce no rows (mirrors [[Dedup.minhashLshPairs]]'s empty-shingle
    * filter).
    *
    * Shape note: shingles build SHUFFLE-FREE inside the scan — tokens
    * are projected once as an attribute (see Text.wordShingles scaladoc
    * for the interpreted-HOF re-eval trap) and a transform slices each
    * n-token window, O(tokens*n) work per document. Earlier shapes
    * paid either a full token-stream window shuffle (lead over
    * posexplode) or O(tokens^2) buffer copies (slice AFTER explode);
    * this pays neither.
    */
  def shingleRows(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"shingle size must be positive, got $n")
    // spread: the tokenize+shingle(+md5 downstream) kernel is the
    // dominant scan-side cost; an unsplittable input would run it
    // serial (guide §2.5). No-op on already-parallel inputs.
    graft.functions
      .spread(df)
      .select(col(idCol).as("id"), graft.text.Text.tokens(col(textCol)).as("_toks"))
      .select(
        col("id"),
        explode(graft.text.Text.wordShinglesFromTokens(col("_toks"), n)).as("shingle")
      )
  }

  /** Wide signature table `(id, _s0 .. _s{numHashes-1})` — one
    * partial-aggregatable groupBy (numHashes running string-minima per
    * id travel the shuffle, not the shingles).
    *
    * Each md5 yields FOUR independent 32-bit slots (disjoint 8-hex-char
    * substrings of the uniformly mixed 128-bit digest), so numHashes
    * slots cost ceil(numHashes/4) digests per shingle instead of
    * numHashes — a 4x cut of the dominant scan cost. 32-bit slots keep
    * min-collisions negligible at realistic shingle counts
    * (P ~ shingles/2^32 per slot).
    */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      numHashes: Int
  ): DataFrame = {
    val digests = (0 until (numHashes + 3) / 4).map { g =>
      md5(concat(lit(s"$g:"), col("shingle"))).as(s"_d$g")
    }
    val aggs = (0 until numHashes).map { k =>
      min(substring(col(s"_d${k / 4}"), (k % 4) * 8 + 1, 8)).as(s"_s$k")
    }
    shingleRows(df, textCol, idCol, shingleN)
      .select(col("id") +: digests: _*)
      .groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Banded signature rows `(id, sig, band, bucket)` — the shared
    * front half of the self-join and cross-corpus pair pipelines.
    */
  private def bandedSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int
  ): DataFrame = {
    require(
      bands > 0 && numHashes % bands == 0 && numHashes / bands > 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)"
    )
    val r = numHashes / bands
    val sigs = minhashSignatures(df, textCol, idCol, shingleN, numHashes)
    val sigArr = array((0 until numHashes).map(k => col(s"_s$k")): _*)
    val bandStructs = array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws("|", (0 until r).map(j => col(s"_s${b * r + j}")): _*)).as("bucket")
      )
    }: _*)
    sigs
      .select(col("id"), sigArr.as("sig"), explode(bandStructs).as("bh"))
      .select(
        col("id"),
        col("sig"),
        col("bh.band").as("band"),
        col("bh.bucket").as("bucket")
      )
  }

  /** Slot-agreement count between `_sa` and `_sb` signature arrays. */
  private def slotAgreement(numHashes: Int) =
    (0 until numHashes)
      .map(k => when(element_at(col("_sa"), k + 1) === element_at(col("_sb"), k + 1), 1).otherwise(0))
      .reduce(_ + _)

  /** MinHash-LSH candidate pairs on the portable family — same
    * pipeline as [[Dedup.minhashLshPairs]] (band the signature, shuffle
    * on (band, bucket), pair within buckets, estimate Jaccard from
    * agreeing slots) with md5-derived slots and buckets.
    *
    * Output: id_a, id_b, jaccard (estimated, k/numHashes — exact in
    * binary, no rounding needed).
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      bucketCap: Int = 0
  ): DataFrame = {
    val banded = bandedSignatures(df, textCol, idCol, shingleN, numHashes, bands)
    BucketJoin
      .selfPairs(banded, Seq("band", "bucket"), "sig", bucketCap)
      .withColumn("jaccard", slotAgreement(numHashes).cast("double") / numHashes)
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .distinct()
  }

  /** Cross-corpus MinHash-LSH pairs — the DECONTAMINATION shape: find
    * every (left, right) document pair above the similarity threshold
    * across two different corpora (e.g. a benchmark/eval set vs the
    * training corpus), without ever comparing all pairs. Both sides are
    * banded with the same hash family; only the (band, bucket) join
    * crosses corpora, so cost is driven by bucket collisions, not
    * |left| x |right|. The (small) left side's banded signatures
    * broadcast under AQE; the corpus is scanned once.
    *
    * Output: id_l, id_r, jaccard (estimated).
    */
  def crossMinhashPairs(
      left: DataFrame,
      right: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      leftBucketCap: Int = 0
  ): DataFrame =
    BucketJoin
      .crossPairs(
        bandedSignatures(left, textCol, idCol, shingleN, numHashes, bands),
        bandedSignatures(right, textCol, idCol, shingleN, numHashes, bands),
        Seq("band", "bucket"),
        "sig",
        leftBucketCap
      )
      .withColumn("jaccard", slotAgreement(numHashes).cast("double") / numHashes)
      .where(col("jaccard") >= threshold)
      .select("id_l", "id_r", "jaccard")
      .distinct()

  /** Portable 60-bit SimHash signatures `(id, sig)`: bit j of the
    * signature is the sign of the per-token +-1 vote on bit j of
    * md5(token) (bit j = bit (j%4) of hex nibble j/4). Explode tokens →
    * 60 codegen'd CASE sums in one partial-aggregatable groupBy → pack.
    */
  def simhashSignatures(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // nibbles are projected ONCE per token row — inlining
    // conv(substring(md5)) into each of the 60 vote aggregates would
    // redo the digest parse 4x per nibble per row
    val h = md5(col("tok"))
    val nibbles = (0 until 15).map { p =>
      conv(substring(h, p + 1, 1), 16, 10).cast("int").as(s"_n$p")
    }
    val votes = (0 until 60).map { j =>
      val bit = shiftright(col(s"_n${j / 4}"), j % 4).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"_v$j")
    }
    val sig = (0 until 60)
      .map(j => when(col(s"_v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    graft.functions
      .spread(df) // serial-scan guard (no-op on parallel inputs)
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .select(col("id") +: nibbles: _*)
      .groupBy("id")
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), sig.as("sig"))
  }

  /** Portable SimHash near-dup pairs, Hamming distance <= maxHamming
    * over the 60-bit signatures. Same pigeonhole candidate generation
    * as [[Dedup.simhashPairs]]: maxHamming+1 chunks — any pair within
    * maxHamming bits agrees exactly on at least one chunk, so the
    * shuffle key is (chunk, chunk_value), never all-pairs.
    *
    * Output: id_a, id_b, hamming.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      bucketCap: Int = 0
  ): DataFrame =
    hammingPairs60(simhashSignatures(df, textCol, idCol), maxHamming, bucketCap)

  /** Near-dup pairs with Hamming distance <= maxHamming over ANY
    * 60-bit signature table `(id, sig)` — the pigeonhole chunk-join
    * shared by text simhash and multimodal perceptual hashes. Hot
    * chunks (> `bucketCap` members) emit a bounded star — see
    * [[BucketJoin.selfPairs]] (0 disables).
    * Output: id_a, id_b, hamming.
    */
  def hammingPairs60(sigs: DataFrame, maxHamming: Int, bucketCap: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 60, s"maxHamming out of range: $maxHamming")
    val chunks = maxHamming + 1
    // chunk c covers bits [c*60/chunks, (c+1)*60/chunks) — uneven
    // chunk widths still cover all 60 bits, which is all the
    // pigeonhole argument needs
    val bounds = (0 to chunks).map(c => c * 60 / chunks)
    // materialize: both sides of the chunk self-join consume the
    // signature table — without this the full signature subtree
    // (explode + wide aggregate) computes twice, and its large
    // generated code compiles twice (measured ~2x end-to-end)
    val mat = graft.functions.materialize(sigs)
    val chunked = mat.select(
      col("id"),
      col("sig"),
      explode(array((0 until chunks).map { c =>
        val lo = bounds(c)
        val width = bounds(c + 1) - lo
        struct(
          lit(c).as("chunk"),
          shiftright(col("sig"), lo).bitwiseAND(lit((1L << width) - 1)).as("ck")
        )
      }: _*)).as("ch")
    ).select(col("id"), col("sig"), col("ch.chunk").as("chunk"), col("ch.ck").as("ck"))
    BucketJoin
      .selfPairs(chunked, Seq("chunk", "ck"), "sig", bucketCap)
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("_sa").bitwiseXOR(col("_sb"))).as("hamming")
      )
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
