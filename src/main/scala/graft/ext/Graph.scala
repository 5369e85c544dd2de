package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over pair frames (near-dup candidate graphs, join
  * graphs): degree profiles, degree-oriented triangle counting, local
  * clustering coefficients.
  *
  * The input anywhere here is the same shape [[Dedup.connectedComponents]]
  * consumes — an edge list produced by an LSH/Jaccard candidate pass —
  * so these compose with the dedup pipelines as the *audit* side:
  * triangle density tells you whether near-dup components are cliques
  * (true duplicate clusters) or stringy chains (transitive-closure
  * over-merging), which is the standard health check before trusting a
  * connected-components keeper at corpus scale.
  *
  * Scale design: triangle enumeration is the textbook quadratic
  * blow-up; the degree-orientation trick (orient every edge from its
  * (degree, id)-smaller endpoint to the larger one) bounds per-vertex
  * join fan-out by out-degree ≤ O(√m), so the wedge join does
  * O(m^{3/2}) work instead of Σ deg² — the difference between a
  * celebrity node generating 10¹⁰ wedges and 10⁵ at web-crawl scale.
  * Three hash shuffles total (degree agg, wedge self-join, closing
  * semi-join); no windows, no collects.
  */
object Graph {

  /** Canonical undirected edge set from an arbitrary pair frame:
    * (src < dst), loops dropped, duplicates collapsed. */
  def canonicalEdges(pairs: DataFrame, a: Column, b: Column): DataFrame =
    pairs.select(least(a, b).as("src"), greatest(a, b).as("dst"))
      .filter(col("src") < col("dst"))
      .distinct()

  /** Per-vertex degree over a canonical edge set. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("degree"))

  /** Two-hop reach per vertex: |{u : 1 ≤ dist(v,u) ≤ 2}| — the
    * friend-of-friend neighborhood size, the cheapest useful
    * centrality proxy on a near-dup graph (a vertex reaching far in
    * two hops sits inside a template family even when its own degree
    * is small).
    *
    * The adjacency self-join's fan-out is Σ deg(mid)² over MIDDLE
    * vertices — one celebrity vertex at crawl scale emits its deg²
    * pairs, and AQE's map-output-byte stats can't see an
    * output-exploding join coming (same caveat as band self-joins —
    * SKILL.md). So the pivot is degree-capped: paths whose middle
    * vertex has degree > `maxDegree` are excluded (a semi-join of the
    * left adjacency against sub-cap vertices, planned as one extra
    * broadcast-able join on the tiny degree frame). Every vertex —
    * hubs included — still reports its own row: direct neighbors
    * always count, and hub NEIGHBORHOODS are reachable through their
    * sub-cap co-members. The cap is part of the operator's declared
    * semantics (the oracle replays it), not a silent truncation. */
  def twoHopReach(pairs: DataFrame, a: Column, b: Column,
      maxDegree: Int = Int.MaxValue): DataFrame = {
    val edges = graft.Tables.materialize(canonicalEdges(pairs, a, b))
    val adj = graft.Tables.materialize(
      edges.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(edges.select(col("dst").as("u"), col("src").as("v"))))
    val subCap = degrees(edges)
      .filter(col("degree") <= maxDegree)
      .select(col("id").as("v"))
    val two = adj.join(subCap, Seq("v"), "left_semi").as("e1")
      .join(adj.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("u"), col("e2.v").as("v"))
    adj.unionByName(two)
      .filter(col("u") =!= col("v"))
      .distinct()
      .groupBy(col("u"))
      .agg(count(lit(1)).as("two_hop_reach"))
      .withColumnRenamed("u", "id")
  }

  /** Per-vertex triangle participation + local clustering coefficient
    * over the undirected graph induced by `pairs`.
    *
    * Algorithm (degree-oriented wedge closing): orient each edge from
    * its (degree, id)-lexicographically smaller endpoint; every
    * triangle then has exactly one vertex with both triangle edges
    * outgoing (the pivot), so enumerating out-wedges (u→a, u→b with
    * a < b) and semi-joining the closing edge {a,b} against the
    * canonical edge set counts each triangle exactly once. Per-vertex
    * counts come from exploding each found triangle to its three
    * corners. lcc = 2·T / (d·(d-1)) — exact integers until one IEEE
    * double division, so the value is bit-stable cross-engine.
    *
    * Output: (id, degree, tri_cnt, lcc) for every vertex incident to
    * at least one edge. */
  def triangleStats(pairs: DataFrame, a: Column, b: Column): DataFrame = {
    val edges = graft.Tables.materialize(canonicalEdges(pairs, a, b))
    val deg = graft.Tables.materialize(degrees(edges))

    val withDeg = edges
      .join(deg.select(col("id").as("src"), col("degree").as("sdeg")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("ddeg")), "dst")
    // orient by (degree, id): u = smaller endpoint, v = larger
    val oriented = graft.Tables.materialize(withDeg.select(
      when(struct(col("sdeg"), col("src")) < struct(col("ddeg"), col("dst")),
        struct(col("src").as("u"), col("dst").as("v")))
        .otherwise(struct(col("dst").as("u"), col("src").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v")))

    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("pivot"),
        col("e1.v").as("wa"), col("e2.v").as("wb"))
    val triangles = wedges
      .join(edges,
        least(col("wa"), col("wb")) === col("src") &&
          greatest(col("wa"), col("wb")) === col("dst"),
        "left_semi")

    val perVertex = triangles
      .select(explode(array(col("pivot"), col("wa"), col("wb"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("tri_cnt"))

    deg.join(perVertex, Seq("id"), "left_outer")
      .select(col("id"), col("degree"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
        when(col("degree") > 1,
          lit(2.0) * coalesce(col("tri_cnt"), lit(0L)).cast("double") /
            (col("degree") * (col("degree") - lit(1L))).cast("double"))
          .otherwise(lit(0.0)).as("lcc"))
  }

  /** DBSCAN over a precomputed ε-neighbor pair frame — density
    * clustering factored the way it actually scales: the expensive
    * part (who is within ε of whom) is delegated to an LSH/banded
    * candidate pass ([[Similarity.lshNearDupPairs]],
    * [[Dedup.minhashLshPairs]]), and this operator is the pure graph
    * algebra on top: degree count → core points (≥ minPts
    * ε-neighbors) → connected components of the core-core subgraph
    * (min-id labels via [[Dedup.connectedComponents]]' checkpointed
    * fixpoint) → border points adopt the smallest adjacent core
    * cluster → everything else is noise. Classic DBSCAN semantics
    * with the candidate graph as the ε-oracle; on a banded candidate
    * graph the result is the standard scalable approximation
    * (exactly DBSCAN whenever the candidate pass has full recall at
    * ε, as a verified-threshold pass is).
    *
    * `all` supplies the full id universe so noise points appear in
    * the output (a clustering that silently drops unclustered rows
    * can't drive a keep/drop decision). Shapes: two degree
    * aggregates, two semi-joins, the CC fixpoint (O(log n) rounds),
    * one border min-aggregate — no windows, no driver state. */
  def dbscanFromPairs(all: DataFrame, id: Column, pairs: DataFrame,
      minPts: Int = 2): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    val e = graft.Tables.materialize(
      canonicalEdges(pairs, col("id1"), col("id2")))
    val adj = e.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(e.select(col("dst").as("u"), col("src").as("v")))
    val core = graft.Tables.materialize(
      adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= minPts).select(col("u").as("id")))
    val coreEdges = e
      .join(core.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(core.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src").as("id1"), col("dst").as("id2"))
    val comp = Dedup.connectedComponents(coreEdges)
    // isolated cores (no core neighbor) are their own cluster
    val clusters = core
      .join(comp.withColumnRenamed("id", "cid"),
        col("id") === col("cid"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id"))
        .as("cluster"))
    val border = adj
      .join(core.select(col("id").as("u")), Seq("u"), "left_anti")
      .join(clusters.select(col("id").as("v"),
        col("cluster").as("vc")), "v")
      .groupBy(col("u").as("id"))
      .agg(min(col("vc")).as("cluster"))
    all.select(id.as("vec_id"))
      .join(clusters.select(col("id").as("vec_id"),
        col("cluster").as("core_cluster")), Seq("vec_id"), "left_outer")
      .join(border.select(col("id").as("vec_id"),
        col("cluster").as("border_cluster")), Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        when(col("core_cluster").isNotNull, "core")
          .when(col("border_cluster").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("core_cluster"), col("border_cluster"))
          .as("cluster"))
  }

  /** Fixed-hop single-source BFS over the undirected graph induced by
    * a pair frame: (id, dist) for every vertex within `hops` of the
    * seed, dist = exact hop distance. The seed is the minimum vertex
    * id — chosen INSIDE the plan (a 1-row aggregate cross-joined in),
    * so no driver collect and any engine derives the same seed.
    *
    * Distributed shape per round: one frontier⋈adjacency hash join +
    * one min-aggregate, frame materialized to truncate lineage (the
    * [[Dedup.connectedComponents]] discipline — without it driver-side
    * analysis doubles per round). Only vertices whose CURRENT label is
    * `round-1` expand, so each edge is traversed from a given side at
    * most once per its endpoint's settle round; rounds are FIXED so
    * the oracle unrolls the identical algebra as CTEs. At 100 TB this
    * is frontier-parallel BFS with the adjacency pre-shuffled on `u` —
    * every round reuses that partitioning; no global sort, no windows.
    * (For multi-source BFS swap the seed frame; the loop is
    * unchanged.) */
  def bfsDistances(pairs: DataFrame, a: Column, b: Column,
      hops: Int = 4): DataFrame = {
    require(hops >= 1, "hops must be >= 1")
    val e = canonicalEdges(pairs, a, b)
    val adj = graft.Tables.materialize(
      e.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(e.select(col("dst").as("u"), col("src").as("v"))))
    var dist = graft.Tables.materialize(
      adj.agg(min(col("u")).as("id")).select(col("id"),
        lit(0L).as("dist")))
    for (h <- 1 to hops) {
      val next = dist.filter(col("dist") === (h - 1))
        .join(adj, dist("id") === adj("u"))
        .select(col("v").as("id"), lit(h.toLong).as("dist"))
      dist = graft.Tables.materialize(
        dist.unionByName(next)
          .groupBy(col("id")).agg(min(col("dist")).as("dist")))
    }
    dist
  }

  /** Fixed-round k-CORE peeling — the density filter that separates
    * "vertices with k neighbors" (degree) from "vertices inside a
    * subgraph where EVERYONE has k neighbors" (core): each round
    * recomputes degrees over the surviving subgraph and drops
    * vertices below k, because removing one round's casualties can
    * push their neighbors below k too. Rounds are FIXED so the
    * oracle unrolls them; convergence within the round budget is the
    * caller's contract (spec-asserted at gate scale — peeling depth
    * is the longest "chain of collapses", small on LSH candidate
    * graphs). On a near-dup graph the k-core is the "everyone
    * duplicates everyone" hard kernel — a stronger eviction signal
    * than membership in a sprawling connected component.
    *
    * Per round: one degree aggregate + two semi-joins, frame
    * materialized (lineage truncation as everywhere). Output: the
    * surviving vertices with their final in-core degree. */
  def kCore(pairs: DataFrame, a: Column, b: Column, k: Int,
      rounds: Int = 6): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // localCheckpoint, NOT cache: each round's plan references the
    // previous round's edges THREE times (degree agg + two
    // semi-joins), so a cache-only loop nests the logical plan ~5×
    // per round over the candidate pipeline's plan and the driver
    // drowns in analysis (SKILL.md: iterative loops must truncate
    // lineage)
    var e = canonicalEdges(pairs, a, b).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val deg = e.select(explode(array(col("src"), col("dst"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("id"))
      e = e
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
    }
    e.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k)
  }

  /** Fixed-round SYNCHRONOUS label propagation — community detection
    * where [[Dedup.connectedComponents]] is too coarse (connectivity
    * merges everything touching; LPA lets dense neighborhoods keep
    * their own label even inside one connected component). Every
    * round, each vertex adopts its neighbors' most frequent label,
    * ties broken by the SMALLEST label — the deterministic total
    * order that makes fixed-round LPA reproducible cross-engine
    * (async/random-order LPA, the published default, can never
    * hash-gate). Rounds are fixed so the oracle unrolls them.
    *
    * Per round: one labels⋈adjacency join + one (vertex, label)
    * count + one min-struct argmax — three hash shuffles on stable
    * keys, frame materialized to truncate lineage. Isolated vertices
    * never appear (no edges); a vertex keeps its own label only by
    * re-earning it through neighbors, the standard synchronous-LPA
    * convention. */
  def labelPropagation(pairs: DataFrame, a: Column, b: Column,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = canonicalEdges(pairs, a, b)
    val adj = graft.Tables.materialize(
      e.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(e.select(col("dst").as("u"), col("src").as("v"))))
    var labels = graft.Tables.materialize(
      adj.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")))
    for (_ <- 1 to rounds) {
      val nbr = adj.join(labels, adj("v") === labels("id"))
        .select(col("u"), col("lbl"))
      labels = graft.Tables.materialize(
        nbr.groupBy(col("u"), col("lbl"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("u"))
          .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l")))
            .as("best"))
          .select(col("u").as("id"), col("best.l").as("lbl")))
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** Fixed-round INTEGER PageRank over a directed edge frame —
    * importance scores in units of `scale` (pr starts at `scale`,
    * the damping update is `(100-d)/100·scale + d·Σ(pr(u) div
    * odeg(u))/100` with every division a FLOOR on non-negative
    * BIGINTs, so the scores are exactly reproducible on any engine —
    * float PageRank is order-dependent under parallel summation and
    * could never hash-gate).
    *
    * Per round: one pr⋈edges join (hash, co-partitioned on src after
    * the first round), one map-side-combined in-degree sum, one left
    * join back to the node frame (dangling mass is dropped — "weak"
    * PageRank, documented convention; the gate's bigram graph has no
    * dangling nodes). The frame is materialized per round, truncating
    * lineage the same way [[Dedup.connectedComponents]] does; rounds
    * are FIXED (`iters`), not run to convergence, so the gate can
    * unroll the identical algebra as oracle CTEs. At 100 TB this is
    * the standard Pregel-free formulation: each round is two shuffles
    * on stable keys, no driver state beyond the loop counter. */
  def pageRank(edgesIn: DataFrame, src: Column, dst: Column,
      iters: Int = 3, scale: Long = 1000000L, damp: Long = 85L)
      : DataFrame = {
    require(iters >= 1 && damp >= 0 && damp <= 100 && scale > 0)
    val e = graft.Tables.materialize(
      edgesIn.select(src.as("src"), dst.as("dst")).distinct())
    val nodes = graft.Tables.materialize(
      e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct())
    val od = graft.Tables.materialize(
      e.groupBy(col("src")).agg(count(lit(1)).as("odeg")))
    val base = scale * (100L - damp) / 100L
    var pr = nodes.select(col("id"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val inSum = e.join(pr, e("src") === pr("id"))
        .join(od, "src")
        .select(col("dst"), expr("pr div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      pr = graft.Tables.materialize(
        nodes.join(inSum, nodes("id") === inSum("dst"), "left_outer")
          .select(col("id"), coalesce(col("m"), lit(0L)).as("m"))
          .select(col("id"),
            expr(s"${base}L + ($damp * m) div 100").as("pr")))
    }
    pr
  }
}
