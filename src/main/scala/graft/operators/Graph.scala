package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed graph analytics over edge tables (SURVEY §2.3).
  *
  * Complements the connected-components sweep in
  * [[graft.dedup.Dedup]] (large-star/small-star): CC answers "which
  * docs are the same", PageRank answers "which nodes matter" — the
  * standard quality prior for web-crawl training corpora (link-graph
  * rank as a document-quality signal, à la Common Crawl harmonic/PR
  * centrality).
  */
object Graph {

  /** Lineage-truncation cadence for the iterative loops ([[pageRank]],
    * [[labelPropagation]]): every 8th round the loop variable is
    * materialized (localCheckpoint, or a reliable checkpoint under
    * `graft.checkpoint.reliable=true` — see
    * [[graft.functions.materialize]]) so a caller-supplied
    * `iterations=30` doesn't build a plan Catalyst re-analyzes
    * quadratically. The fixed 3-iteration quality priors never hit it.
    */
  private val checkpointEvery = 8

  /** Fixed-iteration PageRank over a directed edge list `(src, dst)`.
    * Returns `(node, degree, rank)` where `rank` is scaled by |V|
    * (mean 1 over nodes, so values stay O(1) at any graph size) and
    * `degree` is the out-degree.
    *
    * Iteration in the scaled form: r = (1-d) + d * sum_in r_src/deg_src.
    * Nodes are the distinct edge sources — callers must present every
    * node with at least one out-edge (true by construction for
    * undirected/symmetrized graphs); dangling mass is therefore zero
    * and no redistribution term is needed.
    *
    * Scale shape: the edge table (joined once with out-degrees,
    * hash-partitioned by the join key src and persisted) is the big
    * operand; each iteration is one equi-join of the |V|-sized rank
    * table onto the edges — satisfied IN PLACE by the cached src
    * partitioning whether the planner picks broadcast or sort-merge,
    * so the edges are never re-shuffled — plus one groupBy(dst) whose
    * exchange carries only map-side-combined per-dst partial sums.
    * No driver-side state, no collect. Plan lineage is truncated every
    * [[checkpointEvery]] rounds automatically, so deep caller-supplied
    * iteration counts keep constant per-round analysis cost; the fixed
    * small counts used for quality priors (3-10) never hit the cadence.
    *
    * Cross-engine determinism (the oracle hash-compares): per-node
    * contribution sums run through DECIMAL(38,12) — order-independent
    * and identical in DuckDB — and everything else is pointwise IEEE
    * arithmetic, so ranks are bit-stable at every iteration.
    *
    * The edges-with-degree table is lazily persisted and referenced by
    * the returned plan; cache lifetime is caller-owned (same contract
    * as [[graft.text.Text.tfIdfTopK]]).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double = 0.85
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // Hash-partition the persisted edges-with-degree table by the JOIN
    // key src ONCE (r15; guide §2.4). The point, verified on executed
    // plans: the planner cannot size an aggregate-derived rank table,
    // so it plans the per-iteration join as sort-merge and inserts a
    // probe-side exchange directly above this cache — a leaf stage
    // that AQE MATERIALIZES (full edge shuffle, every iteration)
    // before its stats let it flip the join to broadcast. With the
    // cache already hash-partitioned by src that exchange is never
    // planned; the contribution groupBy(dst) still pays one exchange,
    // but of map-side-combined (dst, partial-sum) rows bounded by |V|
    // per partition, not the edge list.
    val ed = e.join(deg, "src").repartition(col("src")).persist()
    val nodes = deg.select(col("src").as("node"), col("deg"))
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (i <- 1 to iterations) {
      val contribs = ed
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("node"))
        .agg(
          sum((col("rank") / col("deg")).cast(DecimalType(38, 12)))
            .cast("double")
            .as("_s")
        )
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .withColumn(
          "rank",
          lit(1.0 - damping) + lit(damping) * coalesce(col("_s"), lit(0.0))
        )
        .drop("_s")
      // Lineage truncation every `checkpointEvery` rounds (same cadence
      // pattern as Dedup.connectedComponents): caller-supplied deep
      // iteration counts would otherwise hand Catalyst a plan it
      // re-analyzes quadratically. Values are materialized verbatim, so
      // shallow runs (<= cadence) are bit-identical with or without it.
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = graft.functions.materialize(ranks)
    }
    ranks.select(
      col("node"),
      col("deg").as("degree"),
      graft.functions.round6(col("rank")).as("rank")
    )
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for
    * community detection over a directed edge list: after
    * `iterations` rounds, `(node, label)` where each node carries the
    * most frequent label among its in-neighbors (ties broken by the
    * SMALLEST label — that one rule makes every round, and therefore
    * the result, fully deterministic; the randomized-order variant in
    * the paper is not reproducible across runs, let alone engines).
    * Labels start as the node ids, so a converged community is named
    * by one of its members.
    *
    * Like [[pageRank]], callers must present every node with at least
    * one in-edge (true for symmetrized graphs) — a node absent from
    * the in-neighbor aggregation would silently drop out.
    *
    * Scale shape, per iteration: one equi-join of the |V|-row label
    * table onto the persisted edge list (satisfied in place by the
    * cache's src partitioning — the edges are never re-shuffled, see
    * the r15 note at the cache build), one map-side-combinable
    * (node, label) count, then the per-node argmax as a SECOND hash
    * aggregation over the packed (count, label) long, which picks the
    * highest count and breaks ties to the smallest label with no sort
    * anywhere (a window argmax would sort every node partition; the
    * packed max is map-side-combinable and skew-immune). Counts
    * are >= 1 so the packing never overflows. Integer-only
    * arithmetic: nothing to round, bit-identical on any engine.
    */
  /** Per-node triangle count and local clustering coefficient over a
    * symmetric edge list: `(node, degree, triangles, clustering)`.
    *
    * Uses the degree-ordered orientation (each undirected edge kept
    * once, pointing from the (degree, id)-smaller endpoint to the
    * larger): every wedge join then runs over OUT-edges only, whose
    * count per node is bounded by O(sqrt(|E|)) on any graph — the
    * classic trick that turns the naive sum-of-deg² wedge explosion
    * into O(|E|^1.5) total work (Schank & Wagner 2005), robust to
    * power-law hubs (a 10^6-degree hub contributes NO wedges as a
    * center; its triangles are counted at its low-degree neighbors).
    * Each triangle appears exactly once, then credits its three
    * corners through one explode + map-side-combinable count.
    *
    * clustering = 2*triangles / (degree*(degree-1)), round6 (NULL for
    * degree < 2 — undefined, not zero).
    */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String
  ): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"), col("deg"))
    // orientation key: (degree, id) lexicographic — total order, so
    // exactly one direction of each symmetric pair survives
    val withDeg = e
      .join(deg.withColumnRenamed("src", "dst").withColumnRenamed("deg", "dstDeg"), "dst")
      .join(deg, "src")
    val oriented = withDeg
      .where(
        col("deg") < col("dstDeg") ||
          (col("deg") === col("dstDeg") && col("src") < col("dst"))
      )
      .select(col("src"), col("dst"))
      .persist()
    // wedge at center a: a->b, a->c (b < c in orientation order is
    // implied by closing-edge existence); close with oriented b->c
    val wedges = oriented
      .as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src"))
      .where(col("e1.dst") =!= col("e2.dst"))
      .select(
        col("e1.src").as("a"),
        col("e1.dst").as("b"),
        col("e2.dst").as("c")
      )
    val triangles = wedges
      .join(
        oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"),
        "left_semi"
      )
    val perNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("triangles"))
    nodes
      .join(perNode, Seq("node"), "left")
      .select(
        col("node"),
        col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(
          col("deg") >= 2,
          graft.functions.round6(
            lit(2.0) * coalesce(col("triangles"), lit(0L)) /
              (col("deg") * (col("deg") - 1))
          )
        ).as("clustering")
      )
  }

  /** Node-id contract: ids must fit an unsigned 32-bit range
    * (0 <= id < 2^32) — the per-iteration argmax packs (count, label)
    * into one 64-bit word so it hash-aggregates; remap wider id
    * spaces through a dense-id table first.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // ONE full-edge exchange for ALL rounds (r15; guide §2.4): the
    // edge table is hash-partitioned by the JOIN key src ONCE at cache
    // build. Verified on executed plans: the planner cannot size the
    // aggregate-derived label table, plans every round's join as
    // sort-merge, and inserts a probe-side exchange directly above the
    // edge cache — a leaf stage AQE MATERIALIZES (a full-edge shuffle
    // per round) before its runtime stats flip the join to broadcast.
    // With the cache already partitioned by src that exchange is never
    // planned, and the broadcast join preserves the partitioning. The
    // r14 shape instead paid that probe shuffle PLUS a full-edge
    // repartition(dst) per round; the two chained aggregations now pay
    // one exchange of map-side-combined (dst,label,count) rows —
    // bounded by the surviving distinct pairs, shrinking every round
    // as communities converge — plus one |V|-bounded argmax exchange.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src"))
      .persist()
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iterations) {
      // argmax-count with min-label tiebreak PACKED into one long:
      // (count << 32) | (2^32-1-label). A plain max() is then
      // hash-aggregable (ObjectHashAggregate on a struct-min buffer
      // is not — it forced a SortAggregate and a partition-local sort
      // per iteration). Labels are node ids < 2^31 by contract.
      labels = e
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("_c"))
        .groupBy("node")
        .agg(
          max(
            col("_c") * lit(4294967296L) +
              (lit(4294967295L) - col("label"))
          ).as("_p")
        )
        .select(
          col("node"),
          (lit(4294967295L) - (col("_p") % lit(4294967296L))).as("label")
        )
      // Same cadence as pageRank: truncate lineage on deep runs so the
      // per-round analysis cost stays constant; values are unchanged.
      if (i % checkpointEvery == 0 && i < iterations)
        labels = graft.functions.materialize(labels)
    }
    labels
  }

  /** Fixed-round k-core peel over an edge list: `rounds` synchronous
    * rounds of "drop every node with current degree < k, and its
    * edges", then return the surviving `(node, deg)` table with each
    * node's degree inside the PEELED subgraph. Edges are symmetrized
    * and de-duplicated internally (self-loops dropped), so callers may
    * pass either one or both directions. Once the peel reaches its
    * fixpoint the remaining rounds are no-ops and the result IS the
    * exact k-core (spec-pinned); the fixed round budget keeps the plan
    * finite and the oracle unrollable — the same contract as
    * [[pageRank]]/[[labelPropagation]]'s fixed iteration counts, and
    * the k-core needs O(peel depth) rounds, typically far fewer than
    * |V| (degeneracy ordering is sequential; the synchronous peel is
    * the distributed formulation).
    *
    * Dense-subgraph survival is the point: spam/bot farms, template
    * boilerplate rings and co-purchase cliques stay in a high-k core
    * while tendrils and one-off co-occurrences dissolve — the graph
    * analogue of a quality prior for crawl corpora.
    *
    * Scale shape: the LOOP VARIABLE is the |V|-bounded alive-node set,
    * never the edge list — per round the persisted edges (hash-
    * partitioned by src once at cache build, r15) semi-join the
    * alive set on both endpoints (AQE broadcasts the node table; the
    * edges themselves are scanned, not re-shuffled) and ONE
    * groupBy(src) recounts degrees in place on the cached
    * partitioning, with no per-round exchange. The alive set is
    * materialized every round: it is tiny, it feeds three plan
    * branches (both semi-joins + the next round), and an
    * edge-list-valued loop variable was measured 2.5× slower at sf0.1
    * (it re-executed its own lineage per branch and its plan tree grew
    * 3^rounds — analyzer OOM near 15 rounds).
    *
    * Pass `symmetrize = false` when the input is ALREADY a symmetric,
    * self-loop-free, distinct edge set (e.g. a co-occurrence graph
    * built as both directions) to skip the 2|E| union+distinct
    * shuffle; with it true (the safe default) either one- or
    * two-directional inputs are accepted.
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int = 3,
      symmetrize: Boolean = true
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // Hash-partition the persisted edges by src ONCE (r15; guide §2.4):
    // every round's degree recount groupBy(src) — and the final one —
    // then aggregates IN PLACE on the cached partitioning instead of
    // paying a per-round exchange, and when a huge alive set forces the
    // src-side semi-join to sort-merge, the edge side is already
    // clustered by src and only the alive side shuffles. Costs one
    // staging exchange at cache build; saves rounds+1 of them.
    val e = (if (symmetrize)
               dir
                 .union(dir.select(col("dst").as("src"), col("src").as("dst")))
                 .where(col("src") =!= col("dst"))
                 .distinct()
             else dir).repartition(col("src")).persist()
    def induced(alive: DataFrame) = e
      .join(alive, Seq("src"), "left_semi")
      .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
    var alive = e.select("src").distinct()
    for (_ <- 1 to rounds) {
      alive = graft.functions.materialize(
        induced(alive)
          .groupBy("src")
          .agg(count(lit(1)).as("_deg"))
          .where(col("_deg") >= k)
          .select("src")
      )
    }
    induced(alive)
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
  }

  /** Common-neighbor / Jaccard link prediction over a SYMMETRIC edge
    * list: `(node_a, node_b, common, jaccard)` for every non-adjacent-
    * or-adjacent pair sharing >= `minCommon` neighbors, node_a <
    * node_b; jaccard = common / (deg_a + deg_b - common), round6.
    * "Parts that share co-purchase partners but were never bought
    * together" is the classic recommendation candidate.
    *
    * Scale shape: pair generation is the wedge self-join at each
    * CENTER node, which is inherently Θ(sum of deg²) — so hub centers
    * above `maxCenterDegree` are EXCLUDED up front (cap > 0), the same
    * stopword move as the TF-IDF df de-skew: a 10^6-degree hub would
    * emit 10^12 wedge rows while carrying ~zero similarity signal
    * (sharing it says nothing). The cap bounds the join at
    * O(cap · |E|) and is the documented recall trade; `common` counts
    * only capped-center wedges, while degrees in the DENOMINATOR stay
    * the full graph's. Wedge counts map-side-combine on (a, b).
    */
  def commonNeighbors(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxCenterDegree: Int = 0,
      minCommon: Int = 1
  ): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val centers =
      if (maxCenterDegree > 0) deg.where(col("deg") <= maxCenterDegree)
      else deg
    val adj = e.join(centers.select("src"), Seq("src"), "left_semi")
    val pairs = adj
      .as("e1")
      .join(adj.as("e2"), col("e1.src") === col("e2.src"))
      .where(col("e1.dst") < col("e2.dst"))
      .groupBy(col("e1.dst").as("node_a"), col("e2.dst").as("node_b"))
      .agg(count(lit(1)).as("common"))
      .where(col("common") >= minCommon)
    pairs
      .join(deg.select(col("src").as("node_a"), col("deg").as("_da")), "node_a")
      .join(deg.select(col("src").as("node_b"), col("deg").as("_db")), "node_b")
      .select(
        col("node_a"),
        col("node_b"),
        col("common"),
        graft.functions.round6(
          col("common") / (col("_da") + col("_db") - col("common"))
        ).as("jaccard")
      )
  }
}
