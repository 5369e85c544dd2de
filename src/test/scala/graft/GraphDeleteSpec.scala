package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** [[Similarity.graphDelete]] — tombstone deletion with 2-hop hole
  * repair: no tombstone survives anywhere in the delta, capacity and
  * rank contiguity hold, the repaired lists keep the occlusion
  * invariant (deletion forces no edges, unlike orphan repair), the
  * post-delete store never serves a deleted id, and — on a fixture
  * where it is provable — the bridge actually reconnects the two
  * sides of a deleted node. */
class GraphDeleteSpec extends SparkSpec {
  import spark.implicits._

  // the NnDescent/GraphAppend clustered fixture: 10 clusters x 20
  // points, 8 dims
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

  // the deployed lifecycle: build wide, occlusion-prune to 8
  private lazy val store = {
    val wide = Similarity.nnDescent(fixture, $"vec_id", $"embedding",
      k = 16, rounds = 2)
    Similarity.diversifyGraph(fixture, $"vec_id", $"embedding",
      wide, degree = 8).cache()
  }
  private lazy val del = fixture.filter($"vec_id" % 10 === 4)
    .select($"vec_id")
  private lazy val repaired = Similarity.graphDelete(fixture,
    $"vec_id", $"embedding", store, del, $"vec_id", k = 8).cache()

  test("no tombstone survives; capacity and rank contiguity hold") {
    assert(repaired.filter($"node_id" % 10 === 4).count() == 0L)
    assert(repaired.filter($"nbr_id" % 10 === 4).count() == 0L)
    val per = repaired.groupBy($"node_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"))
    assert(per.filter($"n" > 8L || $"mr" =!= $"n").count() == 0L)
    // exactly the touched lists (store lists holding a deleted
    // member) are rewritten — the clustered pools are never empty
    val touched = store.filter($"node_id" % 10 =!= 4)
      .filter($"nbr_id" % 10 === 4)
      .select($"node_id").distinct()
    assert(repaired.select($"node_id").distinct()
      .except(touched).count() == 0L)
    assert(touched.except(repaired.select($"node_id").distinct())
      .count() == 0L)
  }

  test("repaired lists keep the occlusion invariant (adopted-tail exempt)") {
    // adopted edges are reachability patches pinned to the list tail
    // — only they may be occluded; genuine repair edges never are
    val pairs = repaired.filter($"src" === "repair")
      .as("x").join(repaired.as("y"),
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
    assert(viol.count() == 0L,
      "repaired edge occluded by a higher-ranked neighbor")
  }

  test("post-delete store never serves a tombstone") {
    val touched = repaired.select($"node_id").distinct()
    val live = fixture.filter($"vec_id" % 10 =!= 4)
    val merged = store
      .join(del.select($"vec_id".as("node_id")),
        Seq("node_id"), "left_anti")
      .join(touched, Seq("node_id"), "left_anti")
      .select($"node_id", $"nbr_id")
      .unionByName(repaired.select($"node_id", $"nbr_id"))
    val queries = live.filter($"vec_id" < 40)
    val walked = Similarity.graphBeamSearch(live, $"vec_id",
      $"embedding", merged, queries, $"vec_id",
      $"embedding", k = 8, beam = 16, hops = 3, entries = 10)
    assert(walked.filter($"nbr_id" % 10 === 4).count() == 0L)
    // deletion must not DEGRADE self-reachability: the post-delete
    // walk finds every live query the pre-delete walk found (this
    // fixture serves 34/36 pre-delete — an entry/beam effect, not
    // wiring; the contract is no-regression, and every miss stays
    // wired in some list)
    def selfSet(w: org.apache.spark.sql.DataFrame) = w
      .filter($"rank" === 1 && $"nbr_id" === $"query_id")
      .select($"query_id")
    val pre = Similarity.graphBeamSearch(fixture, $"vec_id",
      $"embedding", store, queries, $"vec_id", $"embedding",
      k = 8, beam = 16, hops = 3, entries = 10)
    val lost = selfSet(pre).except(selfSet(walked))
    assert(lost.count() == 0L,
      s"deletion lost self-reachability: ${lost.collect().mkString(",")}")
    // and every live node still appears in some post-delete list OR
    // was absent pre-delete too (no adoption was needed here — the
    // orphan-repair path is pinned by the gate + the line fixture)
    val postNbrs = merged.select($"nbr_id".as("vec_id")).distinct()
    val preNbrs = store.select($"nbr_id".as("vec_id")).distinct()
    assert(preNbrs.filter($"vec_id" % 10 =!= 4)
      .except(postNbrs).count() == 0L,
      "a live pre-delete member vanished from every list")
  }

  // ---- adoption-candidate bound on a LARGE clustered batch -----------

  /** The round-17 weak: adoption targets came from `touched ×
    * orphans` — deletion-batch-QUADRATIC (both sides grow with
    * |del|). [[Similarity.deleteAdoptionCandidates]] restricts each
    * orphan to touched lists 2-hop-adjacent to its former adopters:
    * candidate volume is Σ_o |adopters(o)| · (1 + deg + in-deg) —
    * batch·degree²-bounded for ANY orphan set, which this pins on a
    * 50% clustered delete batch (100 tombstones over the 200-node
    * store) against both the analytic bound and the old quadratic
    * volume. */
  test("adoption candidates are degree-bounded, not touched × orphans") {
    val bigDel = fixture.filter($"vec_id" % 2 === 0).select($"vec_id")
    val g = store.select($"node_id", $"nbr_id", $"cosine").cache()
    val keep = g.join(bigDel.select($"vec_id".as("node_id")),
      Seq("node_id"), "left_anti")
    val touched = keep
      .join(bigDel.select($"vec_id".as("nbr_id")),
        Seq("nbr_id"), "left_semi")
      .select($"node_id").distinct().cache()
    // the bound must hold for ANY orphan set — drive the helper with
    // a spread synthetic one (real orphan production is rare and
    // fixture-fragile; the helper is agnostic)
    val orphans = fixture
      .filter($"vec_id" % 2 =!= 0 && $"vec_id" % 5 === 1)
      .select($"vec_id".as("oid")).cache()
    val cand = Similarity.deleteAdoptionCandidates(g, touched, orphans)
      .cache()
    val nT = touched.count()
    val nO = orphans.count()
    assert(nO >= 15L && nT >= 30L, "fixture too small to be probative")
    // every candidate is a touched list
    assert(cand.join(touched, Seq("node_id"), "left_anti").count() == 0L)
    // analytic volume bound: |cand| <= |former-adopter pairs| *
    // (1 + max out-degree + max in-degree)
    val fad = g.select($"node_id".as("fa"), $"nbr_id".as("oid"))
      .join(orphans, Seq("oid"), "left_semi").cache()
    val dOut = g.groupBy($"node_id").agg(count(lit(1)).as("d"))
      .agg(max($"d")).first().getLong(0)
    val dIn = g.groupBy($"nbr_id").agg(count(lit(1)).as("d"))
      .agg(max($"d")).first().getLong(0)
    val nC = cand.count()
    assert(nC <= fad.count() * (1 + dOut + dIn),
      s"candidate volume $nC above the degree bound")
    // and strictly below the quadratic form's volume on this batch
    assert(nC < nT * nO,
      s"candidate volume $nC not below touched×orphans ${nT * nO}")
    // end-to-end: the large clustered delete still honors the
    // contracts, and any adopted edge lands on a candidate list
    val rep = Similarity.graphDelete(fixture, $"vec_id", $"embedding",
      store, bigDel, $"vec_id", k = 8).cache()
    assert(rep.filter($"nbr_id" % 2 === 0).count() == 0L)
    assert(rep.filter($"src" =!= "dropped").groupBy($"node_id")
      .agg(count(lit(1)).as("n")).filter($"n" > 8L).count() == 0L)
    val adoptedOff = rep.filter($"src" === "adopted")
      .select($"node_id").join(touched, Seq("node_id"), "left_anti")
    assert(adoptedOff.count() == 0L,
      "an adopted edge landed outside the touched set")
  }

  // ---- bridge proof on an angular line -------------------------------

  /** 21 unit vectors along a 2° arc: exact neighbors are the
    * adjacent ids, so with k = 2 node 9's list is {8, 10} and node
    * 11's is {10, 12}. Deleting node 10 leaves holes at 9 and 11
    * whose ONLY path to each other runs through the tombstone — the
    * 2-hop bridge must produce edges (9,11) and (11,9). */
  private lazy val line = (0 to 20).map { i =>
    val th = math.toRadians(2.0 * i)
    (i.toLong, Array(math.cos(th).toFloat, math.sin(th).toFloat,
      0.0f, 0.0f))
  }.toDF("vec_id", "embedding")

  test("2-hop bridge reconnects across the tombstone") {
    val g = Similarity.nnDescent(line, $"vec_id", $"embedding",
      k = 2, rounds = 3)
    // sanity: the line graph is the adjacency list
    assert(g.filter($"node_id" === 9 && $"nbr_id" === 10).count() == 1L)
    val rep = Similarity.graphDelete(line, $"vec_id", $"embedding",
      g, Seq(10L).toDF("vec_id"), $"vec_id", k = 2).cache()
    assert(rep.filter($"nbr_id" === 10L).count() == 0L)
    assert(rep.filter($"node_id" === 9 && $"nbr_id" === 11)
      .count() == 1L, "bridge edge 9->11 missing")
    assert(rep.filter($"node_id" === 11 && $"nbr_id" === 9)
      .count() == 1L, "bridge edge 11->9 missing")
  }
}
