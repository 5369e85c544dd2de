package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** [[Similarity.graphAppend]] — the search-then-connect insertion
  * contract on the clustered fixture: appended nodes land full
  * within-cluster lists at high recall vs the exact base-restricted
  * truth, and touched base lists are exactly the (old ∪ reverse
  * proposals) re-rank, never exceeding k. */
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

  test("appended nodes get full k-lists of base members") {
    val app = out.filter($"src" === "appended").cache()
    assert(app.count() == 20L * 8L) // 20 appended nodes x k=8
    assert(app.filter($"nbr_id" % 10 === 9).count() == 0L) // base only
    val perNode = app.groupBy($"node_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"))
    assert(perNode.filter($"n" =!= 8L || $"mr" =!= 8).count() == 0L)
  }

  test("placement recall >= 0.8 vs exact base-restricted truth") {
    val truth = Similarity.bruteForceTopK(base, $"vec_id", $"embedding",
        appended, $"vec_id", $"embedding", 8)
      .select($"query_id", $"nbr_id")
    val got = out.filter($"src" === "appended")
      .select($"node_id".as("query_id"), $"nbr_id")
    val hits = truth.join(got, Seq("query_id", "nbr_id")).count()
    assert(hits >= (0.9 * 20 * 8).toLong,
      s"placement recall ${hits / 160.0} below 0.9")
  }

  test("updated lists are the (old ∪ proposals) re-rank, bounded by k") {
    val upd = out.filter($"src" === "updated").cache()
    val touched = out.filter($"src" === "appended")
      .select($"nbr_id".as("node_id")).distinct()
    // exactly the touched nodes appear, each with <= k rows
    assert(upd.select($"node_id").distinct().except(touched).count() == 0L)
    assert(touched.except(upd.select($"node_id").distinct()).count() == 0L)
    assert(upd.groupBy($"node_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 8L).count() == 0L)
    // every updated member is either an old neighbor or an appended
    // proposer that placed this node in its walk top-k
    val legal = graph.select($"node_id", $"nbr_id")
      .unionByName(out.filter($"src" === "appended")
        .select($"nbr_id".as("node_id"), $"node_id".as("nbr_id")))
    assert(upd.select($"node_id", $"nbr_id").except(legal).count() == 0L)
  }

  test("orphan repair: every insert is adopted and walk-reachable") {
    // post-repair, NO appended node may be absent from every updated
    // list — the forced reverse-adoption contract
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
}
