package graft.operators

import graft.dedup.BucketJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance (fuzzy) self-join — the record-linkage /
  * entity-resolution primitive: all pairs of rows whose strings are
  * within Levenshtein distance `maxEdits`, WITHOUT an all-pairs
  * comparison.
  *
  * Blocking is the symmetric-delete neighborhood (the SymSpell
  * scheme, Garbe 2012): D_k(s) = every string obtainable from s by
  * deleting at most k characters. If lev(a, b) <= k then any minimal
  * edit script aligning a and b deletes each side's unaligned
  * characters — at most k per side — so D_k(a) ∩ D_k(b) is non-empty
  * and a JOIN ON SHARED VARIANT is a lossless candidate generator
  * (unlike q-gram count filters, which break on short strings where k
  * edits can destroy every gram). Candidates are then verified with
  * the THRESHOLDED Levenshtein kernel (early-exits once the running
  * distance exceeds k — O(k·n) per pair, not O(n²)).
  *
  * Scale shape: variant generation is scan-side (pure codegen'd
  * array expressions, |s|^k variants per row — sized for
  * record-linkage strings: names, titles, SKUs; k=2 on a 40-char
  * string is ~800 variants; for DOCUMENT similarity use MinHash).
  * The shuffle is keyed on the variant hash; per-pair work happens
  * only within a variant bucket ([[graft.dedup.BucketJoin]] — cap 0 =
  * exact by default, same contract as the dedup pair APIs). A
  * candidate pair sharing many variants is deduplicated BEFORE the
  * distance kernel runs.
  */
object FuzzyJoin {

  /** All strings obtainable from `c` by deleting at most `k`
    * characters (including `c` itself), deduplicated. Pure `Column`
    * expression — sequence/transform/substr compose inside
    * whole-stage codegen.
    */
  def deletionVariants(c: Column, k: Int): Column = {
    require(k >= 0, s"maxEdits must be >= 0, got $k")
    def del1(s: Column): Column =
      when(
        length(s) >= 1,
        transform(
          sequence(lit(1), length(s)),
          i => concat(substr(s, lit(1), i - lit(1)), substr(s, i + lit(1), length(s)))
        )
      ).otherwise(array().cast("array<string>"))
    // frontier of exactly-d deletions at each level; union accumulates
    var frontier = array(c)
    var acc = frontier
    (1 to k).foreach { _ =>
      frontier = array_distinct(flatten(transform(frontier, del1(_))))
      acc = concat(acc, frontier)
    }
    array_distinct(acc)
  }

  /** Representatives of each DISTINCT string: (`_s`, `_nid` = min id
    * among rows carrying it). All expensive work (variant explosion,
    * candidate join, distance kernel) runs at DISTINCT-STRING grain —
    * entity data repeats heavily (64 distinct part names across 20k
    * rows here; the same ratio holds for real name/SKU columns), and
    * a row-grain candidate join would re-verify every copy of a hot
    * string against every copy of its neighbors.
    */
  private def reps(df: DataFrame, strCol: String, idCol: String): DataFrame =
    df.groupBy(col(strCol).as("_s")).agg(min(col(idCol)).as("_nid"))

  /** Verified DISTINCT-string pairs within `maxEdits`: (_sa, _sb,
    * id_a, id_b, dist) where id_a/id_b are the representative (min)
    * row ids and _sa != _sb (dist >= 1).
    */
  private def repStrPairs(r: DataFrame, maxEdits: Int, bucketCap: Int): DataFrame = {
    val rows = r.select(
      explode(deletionVariants(col("_s"), maxEdits)).as("_variant"),
      col("_nid").as("id"),
      col("_s")
    )
    BucketJoin
      .selfPairs(rows, Seq("_variant"), "_s", bucketCap)
      .select(col("id_a"), col("id_b"), col("_sa"), col("_sb"))
      .distinct()
      .select(
        col("_sa"),
        col("_sb"),
        col("id_a"),
        col("id_b"),
        levenshtein(col("_sa"), col("_sb"), maxEdits).as("dist")
      )
      .where(col("dist") >= 0)
  }

  /** All pairs (id_a < id_b) with lev(str_a, str_b) <= maxEdits, plus
    * the exact distance. Exact by construction: lossless symmetric-
    * delete blocking, then exact (thresholded) Levenshtein
    * verification — a pair is emitted if and only if it is within the
    * budget.
    *
    * Candidate generation, verification and the distance kernel all
    * run once per DISTINCT STRING PAIR; the result is then expanded to
    * row-id pairs by two equi-joins on the string (plus the in-group
    * dist-0 pairs of rows sharing a string). The expansion is
    * output-sized — the quadratic part of a hot identical-string group
    * exists in the ANSWER, never in the candidate stage.
    *
    * `bucketCap` bounds a hot variant bucket via [[BucketJoin]]'s star
    * fallback (0 = exact/unbounded, the default — capping trades
    * recall for a bound, same opt-in as the dedup pair APIs).
    */
  def fuzzySelfPairs(
      df: DataFrame,
      strCol: String,
      idCol: String,
      maxEdits: Int,
      bucketCap: Int = 0
  ): DataFrame = {
    require(maxEdits >= 0, s"maxEdits must be >= 0, got $maxEdits")
    val strPairs = repStrPairs(reps(df, strCol, idCol), maxEdits, bucketCap)
      .select(col("_sa"), col("_sb"), col("dist"))
    // expand verified string pairs to row-id pairs
    val a = df.select(col(strCol).as("_sa"), col(idCol).as("_ia"))
    val b = df.select(col(strCol).as("_sb"), col(idCol).as("_ib"))
    val cross = strPairs
      .join(a, "_sa")
      .join(b, "_sb")
      .select(
        least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"),
        col("dist")
      )
    // rows sharing one string: distance 0 by definition, no kernel run
    val same = df
      .select(col(strCol).as("_s"), col(idCol).as("_ia"))
      .join(df.select(col(strCol).as("_s"), col(idCol).as("_ib")), "_s")
      .where(col("_ia") < col("_ib"))
      .select(col("_ia").as("id_a"), col("_ib").as("id_b"), lit(0).as("dist"))
    cross.unionByName(same)
  }

  /** End-to-end entity resolution: fuzzy-match rows within `maxEdits`,
    * chain matches into entities (transitive closure — "Jon Smith" ~
    * "John Smith" ~ "John Smyth" is ONE entity even though the ends
    * differ by more than the budget), and elect each entity's
    * canonical record by `rankCol` (highest wins, ties to lowest id).
    *
    * Output: one row per input row — `idCol`, `entity_id` (the
    * entity's min member id; rows matching nothing are their own
    * singleton entity), `canonical_id`, `n_members`.
    *
    * Composition of exact pieces: [[repStrPairs]] (lossless blocking +
    * exact verification at DISTINCT-STRING grain),
    * [[graft.dedup.Dedup.connectedComponents]] over the STRING-level
    * graph (nodes = distinct strings keyed by their min row id — a
    * million-row identical-name group is ONE node, and its rows
    * inherit the label through the representative join, so the
    * component computation never sees the quadratic pair expansion),
    * and the map-side-combinable argmax election of
    * [[graft.dedup.Dedup.canonicalPick]].
    */
  def resolveEntities(
      df: DataFrame,
      strCol: String,
      idCol: String,
      maxEdits: Int,
      rankCol: String,
      bucketCap: Int = 0
  ): DataFrame = {
    val r = reps(df, strCol, idCol)
    val edges = repStrPairs(r, maxEdits, bucketCap).select(col("id_a"), col("id_b"))
    val labels = graft.dedup.Dedup
      .connectedComponents(edges)
      .select(col("id").as("_lid"), col("label").as("_lbl"))
    val ent = df
      .select(col(strCol).as("_s"), col(idCol).as("_id"), col(rankCol).cast("double").as("_r"))
      .join(r, "_s")
      .join(labels, col("_nid") === col("_lid"), "left_outer")
      .select(col("_id"), coalesce(col("_lbl"), col("_nid")).as("entity_id"), col("_r"))
    val canon = ent
      .groupBy("entity_id")
      .agg(
        min(struct((-col("_r")).as("_nr"), col("_id").as("_cid"))).as("_w"),
        count(lit(1)).as("n_members")
      )
      .select(col("entity_id"), col("_w._cid").as("canonical_id"), col("n_members"))
    ent
      .join(canon, "entity_id")
      .select(col("_id").as(idCol), col("entity_id"), col("canonical_id"), col("n_members"))
  }
}
