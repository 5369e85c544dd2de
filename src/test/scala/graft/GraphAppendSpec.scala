package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** [[Similarity.graphAppend]] — the search-then-connect insertion
  * contract on the clustered fixture under the round-17
  * occlusion-selection semantics (HNSW's insert-side neighbor
  * heuristic): appended lists are occlusion-selected from the beam
  * pool (base members only, capacity ≤ k, rank-1 = the true nearest
  * placement), touched base lists are the occlusion re-selection of
  * (old ∪ reverse proposals) bounded by k, the diversity invariant
  * holds on every delta edge except forced orphan adoptees, orphan
  * repair keeps every insert walk-reachable, and — the ADVICE
  * capacity case — more than k orphans sharing one rank-1 target
  * still leaves the target's list at exactly k rows. */
class GraphAppendSpec extends SparkSpec {
  import spark.implicits._

  // same structure as NnDescentSpec's fixture: 10 clusters x 20
  // points, 8 dims, deterministic wobble.
  private lazy val fixture = {
    val rows = for {
      c <- 0 until 10
      j <- 0 until 20
    } yield {
      val id = (c * 20 + j).toLong
      val v = Array.tabulate(8) { d =>
        val base =
          if (d == c % 4) 10.0f
          else if (d == 4 + c / 4) 6.0f + (c % 3)
          else 0.0f
        base + (if (d == (j % 8)) 0.5f + 0.01f * j else 0.0f)
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private lazy val base = fixture.filter($"vec_id" % 10 =!= 9)
  private lazy val appended = fixture.filter($"vec_id" % 10 === 9)
  private lazy val graph = Similarity.nnDescent(base, $"vec_id",
    $"embedding", k = 8, rounds = 2).cache()
  // entries = 10 -> stride 18 over the 180 base ids = exactly one
  // stratified entry per planted cluster, so every appended node's
  // own cluster is reachable (the disconnected-graph case the
  // stratified entry set exists for; smallest-8 entries would strand
  // clusters 4 and 9 entirely).
  private lazy val out = Similarity.graphAppend(base, $"vec_id",
    $"embedding", graph, appended, $"vec_id", $"embedding",
    k = 8, beam = 16, hops = 2, entries = 10).cache()

  test("appended lists: base-only, bounded, contiguous, non-empty") {
    val app = out.filter($"src" === "appended").cache()
    assert(app.filter($"nbr_id" % 10 === 9).count() == 0L) // base only
    val perNode = app.groupBy($"node_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"))
    // occlusion selection may keep fewer than k (clustered lists are
    // occlusion-dense by design) but never more, ranks stay 1..n,
    // and every appended node has a list (rank-1 never occludes)
    assert(perNode.filter($"n" > 8L || $"mr" =!= $"n").count() == 0L)
    assert(perNode.count() == 20L)
  }

  test("rank-1 placement matches the exact nearest base neighbor") {
    // rank-1 survives any occlusion selection, so the head of each
    // appended list must be the walk's best candidate — on this
    // fixture the exact base-restricted top-1 for >= 90% of inserts
    val truth = Similarity.bruteForceTopK(base, $"vec_id", $"embedding",
        appended, $"vec_id", $"embedding", 1)
      .select($"query_id", $"nbr_id")
    val got = out.filter($"src" === "appended" && $"rank" === 1)
      .select($"node_id".as("query_id"), $"nbr_id")
    val hits = truth.join(got, Seq("query_id", "nbr_id")).count()
    assert(hits >= 18L, s"rank-1 placement hit $hits/20 below 0.9")
  }

  test("updated lists are legal re-selections, bounded by k") {
    val upd = out.filter($"src" === "updated").cache()
    val touched = out.filter($"src" === "appended")
      .select($"nbr_id".as("node_id")).distinct()
    // exactly the touched nodes appear, each with <= k rows
    assert(upd.select($"node_id").distinct().except(touched).count() == 0L)
    assert(touched.except(upd.select($"node_id").distinct()).count() == 0L)
    assert(upd.groupBy($"node_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 8L).count() == 0L)
    // every updated member is either an old neighbor or an appended
    // proposer that placed this node in its selected list
    val legal = graph.select($"node_id", $"nbr_id")
      .unionByName(out.filter($"src" === "appended")
        .select($"nbr_id".as("node_id"), $"node_id".as("nbr_id")))
    assert(upd.select($"node_id", $"nbr_id").except(legal).count() == 0L)
  }

  test("diversity invariant: only adoptee edges may be occluded") {
    // occlusion violations in the delta can only be forced orphan
    // adoptions (reachability outranks diversity for repair edges) —
    // every violating edge must point at an APPENDED node; edges to
    // base neighbors are occlusion-free by construction
    val delta = out.select($"node_id", $"nbr_id", $"rank", $"cosine")
    val pairs = delta.as("x").join(delta.as("y"),
        col("x.node_id") === col("y.node_id") &&
          col("y.rank") < col("x.rank"))
      .select(col("x.node_id").as("node_id"),
        col("x.nbr_id").as("b"), col("x.cosine").as("cos_ab"),
        col("y.nbr_id").as("bp"))
    def side(idName: String, v: String, sn: String) =
      Similarity.vectorsWithNorm(fixture, $"vec_id", $"embedding",
        idName, v, sn)
    val viol = pairs
      .join(side("b", "bv", "sb"), Seq("b"))
      .join(side("bp", "pv", "sp"), Seq("bp"))
      .filter(graft.functions.VecKernels.vecDotDec($"bv", $"pv")
        .cast("double") / ($"sb" * $"sp") > $"cos_ab")
    assert(viol.filter($"b" % 10 =!= 9).count() == 0L,
      "non-adoptee delta edge occluded by a higher-ranked neighbor")
  }

  test("orphan repair: every insert is adopted and walk-reachable") {
    // post-repair, NO appended node may be absent from every updated
    // list — the forced reverse-adoption contract (no target here
    // collects more than k orphans; the capacity case is pinned by
    // the dense fixture below)
    val upd = out.filter($"src" === "updated")
    val adopted = upd.select($"nbr_id".as("vec_id")).distinct()
    val missing = appended.select($"vec_id")
      .join(adopted, Seq("vec_id"), "left_anti")
    assert(missing.count() == 0L,
      s"unadopted inserts: ${missing.collect().mkString(",")}")
    // and adoption converts to SERVING reachability: a beam walk over
    // the merged graph, queried with the inserts themselves, returns
    // each insert as its own rank-1 neighbor (cos = 1 to itself)
    val touched = upd.select($"node_id").distinct()
    val merged = out.select($"node_id", $"nbr_id")
      .unionByName(graph
        .join(touched, Seq("node_id"), "left_anti")
        .select($"node_id", $"nbr_id"))
    // stratified stride (one entry per planted cluster), matching
    // the insertion walk — smallest-10 entries would strand clusters
    import org.apache.spark.sql.expressions.Window
    val entries = base.select($"vec_id".as("cand"))
      .withColumn("r",
        row_number().over(Window.orderBy($"cand")) - 1)
      .filter($"r" % 18 === 0).select($"cand")
    val walked = Similarity.graphBeamSearch(fixture, $"vec_id",
      $"embedding", merged, appended, $"vec_id", $"embedding",
      k = 8, beam = 16, hops = 3, entries = 10,
      entriesDf = Some(entries))
    val selfFound = walked
      .filter($"rank" === 1 && $"nbr_id" === $"query_id").count()
    assert(selfFound >= 19L, // >= 95% of the 20 inserts
      s"self_found $selfFound/20 below 0.95 after repair")
  }

  // ---- ADVICE capacity case: > k orphans sharing one rank-1 target

  /** Dense directional fixture engineered so every appended vector's
    * selected list is exactly {t} (t occludes every other base
    * candidate), t's re-selection keeps only one proposal (the rest
    * mutually occlude), and the 9 remaining orphans all adopt t —
    * na = 9 > k = 8, the case the round-16 repair mishandled (lists
    * grew past k with no final cut). */
  private lazy val denseBase = {
    // b_0..b_11 hug u = (10, eps*i, 0, ...); t = id 12 = (10, 0, 2, ...)
    val bs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        if (d == 0) 10.0f else if (d == 1) 0.01f * i else 0.0f))
    }
    val t = (12L, Array.tabulate(8)(d =>
      if (d == 0) 10.0f else if (d == 2) 2.0f else 0.0f))
    (bs :+ t).toDF("vec_id", "embedding")
  }
  private lazy val denseApp = (0 until 10).map { i =>
    (100L + i, Array.tabulate(8)(d =>
      if (d == 0) 10.0f else if (d == 2) 6.0f + 0.01f * i else 0.0f))
  }.toDF("vec_id", "embedding")

  test("capacity holds when > k orphans share one adoption target") {
    val g = Similarity.nnDescent(denseBase, $"vec_id", $"embedding",
      k = 8, rounds = 2)
    val res = Similarity.graphAppend(denseBase, $"vec_id",
      $"embedding", g, denseApp, $"vec_id", $"embedding",
      k = 8, beam = 16, hops = 2, entries = 4).cache()
    val app = res.filter($"src" === "appended").cache()
    // every appended list is exactly {t}: t is rank-1 and occludes
    // every other base candidate (cos(t, b) = 0.98 > cos(a, b) = 0.86)
    assert(app.count() == 10L)
    assert(app.filter($"nbr_id" =!= 12L || $"rank" =!= 1).count() == 0L)
    val upd = res.filter($"src" === "updated").cache()
    // only t is touched, and its repaired list holds EXACTLY k rows
    // (9 adoptees compete for 8 slots after the max(k - na, 0) = 0
    // pre-cut; one orphan is evicted by the final rank <= k cut)
    assert(upd.select($"node_id").distinct().count() == 1L)
    assert(upd.filter($"node_id" === 12L).count() == 8L)
    val perNode = upd.groupBy($"node_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"))
    assert(perNode.filter($"n" > 8L || $"mr" =!= $"n").count() == 0L)
    // all 8 surviving slots are adoptees (appended band)
    assert(upd.filter($"nbr_id" < 100L).count() == 0L)
    // the evicted 9th orphan is OBSERVABLE: exactly one src='dropped'
    // row, on the shared target, rank past capacity, naming an
    // appended id — the delta admits the reachability miss instead
    // of silently cutting it
    val drop = res.filter($"src" === "dropped").cache()
    assert(drop.count() == 1L)
    assert(drop.filter($"node_id" === 12L && $"nbr_id" >= 100L &&
      $"rank" === 9).count() == 1L)
    // and the dropped edge is disjoint from the surviving list
    assert(upd.select($"nbr_id").intersect(drop.select($"nbr_id"))
      .count() == 0L)
  }
}
