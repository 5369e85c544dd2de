package graft

import org.apache.spark.sql.functions.col

import graft.ext.Graph

/** [[graft.ext.Graph]] — degree-oriented triangle counting on known
  * synthetic graphs where the exact answer is hand-computable. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleStats counts K4 exactly: 3 triangles per vertex, lcc 1") {
    // complete graph on {1,2,3,4}: C(4,3)=4 triangles, each vertex in 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("id1", "id2")
    val out = Graph.triangleStats(edges, col("id1"), col("id2"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.length == 4)
    out.foreach { case (_, deg, tri, lcc) =>
      assert(deg == 3L); assert(tri == 3L); assert(lcc == 1.0)
    }
  }

  test("triangleStats on a path has zero triangles and lcc 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2")
    val out = Graph.triangleStats(edges, col("id1"), col("id2"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 1L, 0L, 0.0), (2L, 2L, 0L, 0.0),
      (3L, 2L, 0L, 0.0), (4L, 1L, 0L, 0.0)))
  }

  test("triangleStats is orientation/duplicate/loop insensitive") {
    // triangle {1,2,3} fed as duplicated, reversed, self-loop-polluted
    // pairs plus a pendant 3-4: canonicalization must collapse it all
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 1L), (3L, 4L)).toDF("id1", "id2")
    val out = Graph.triangleStats(messy, col("id1"), col("id2"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq == Seq(
      (1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 1L, 0L)))
    // vertex 3: degree 3, one triangle -> lcc = 2*1/(3*2) = 1/3 exact
    assert(out.find(_._1 == 3L).get._4 == 1.0 / 3.0)
  }

  test("triangleStats handles skewed hub without wedge explosion " +
      "(star + one closing edge)") {
    // hub 100 connected to 1..50, plus edge (1,2): exactly 1 triangle.
    // Degree orientation makes every spoke the pivot side, so the hub
    // contributes out-degree <= 1 wedges instead of C(50,2).
    val star = (1L to 50L).map(i => (100L, i)) :+ (1L, 2L)
    val out = Graph.triangleStats(star.toDF("id1", "id2"),
      col("id1"), col("id2"))
    assert(out.filter(col("tri_cnt") > 0).count() == 3L)
    assert(out.agg(org.apache.spark.sql.functions.sum(col("tri_cnt")))
      .as[Long].head() == 3L) // one triangle x 3 corners
  }

  test("twoHopReach uncapped: star + one leaf edge, hand-computed") {
    // hub 0 — leaves 1..5; extra edge 1-2
    val edges = ((1L to 5L).map(l => (0L, l)) :+ (1L, 2L)).toDF("a", "b")
    val got = Graph.twoHopReach(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    // every leaf reaches the hub + all other leaves through it
    assert(got == Map(0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 5L,
      4L -> 5L, 5L -> 5L))
  }

  test("twoHopReach maxDegree caps the PIVOT: paths through the hub " +
      "are dropped, hubs still report their own row") {
    val edges = ((1L to 50L).map(l => (0L, l)) :+ (1L, 2L)).toDF("a", "b")
    val got = Graph.twoHopReach(edges, col("a"), col("b"), maxDegree = 10)
      .as[(Long, Long)].collect().toMap
    // hub (degree 50 > cap) keeps its full direct neighborhood, and
    // two-hop through sub-cap leaves adds nothing new
    assert(got(0L) == 50L)
    // leaf 1: direct {0, 2}; pivot 2 is sub-cap but only leads back
    assert(got(1L) == 2L && got(2L) == 2L)
    // plain leaf: direct {0} only — the hub pivot is capped away
    assert((3L to 50L).forall(got(_) == 1L))
    // sanity: uncapped behavior differs (leaves see everyone)
    val un = Graph.twoHopReach(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(un(3L) == 50L)
  }

  test("pageRank: hand-computed 2-round integer scores") {
    // a->b, c->b, b->a; odeg all 1
    // round 1: a=150000+850000=1000000, b=150000+85%*2e6=1850000,
    //          c=150000 (no in-edges)
    // round 2: b gets a(1000000)+c(150000)=1150000 ->
    //          150000+977500=1127500; a gets b(1850000) ->
    //          150000+1572500=1722500; c stays 150000
    val edges = Seq(("a", "b"), ("c", "b"), ("b", "a")).toDF("s", "d")
    val pr = Graph.pageRank(edges, col("s"), col("d"), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(pr === Map("a" -> 1722500L, "b" -> 1127500L, "c" -> 150000L))
  }

  test("pageRank: duplicate input edges collapse (distinct edge set)") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("s", "d")
    val pr = Graph.pageRank(edges, col("s"), col("d"), iters = 1)
      .as[(String, Long)].collect().toMap
    // one distinct edge each way: both get 150000 + 850000
    assert(pr === Map("a" -> 1000000L, "b" -> 1000000L))
  }
}
