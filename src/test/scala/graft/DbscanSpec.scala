package graft

import org.apache.spark.sql.functions.col

import graft.ext.Graph

/** [[graft.ext.Graph.dbscanFromPairs]] on hand-computable ε-graphs. */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(all: Seq[Long], pairs: Seq[(Long, Long)],
      minPts: Int = 2): Map[Long, (String, Option[Long])] = {
    val out = Graph.dbscanFromPairs(
      all.toDF("vec_id"), col("vec_id"),
      pairs.toDF("id1", "id2"), minPts)
      .as[(Long, String, Option[Long])].collect()
    out.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("chain of 4: ends are border, middle is core, one cluster") {
    // 1-2-3-4: deg(1)=deg(4)=1 (border), deg(2)=deg(3)=2 (core);
    // cluster label = min core id = 2; borders adopt it; 9 is noise
    val m = run(Seq(1L, 2L, 3L, 4L, 9L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m(2L) == ("core", Some(2L)))
    assert(m(3L) == ("core", Some(2L)))
    assert(m(1L) == ("border", Some(2L)))
    assert(m(4L) == ("border", Some(2L)))
    assert(m(9L) == ("noise", None))
  }

  test("isolated pair is all border-free noise-free? no: both noise " +
      "at minPts=2, a cluster at minPts=1") {
    // single edge 5-6: both endpoints have 1 neighbor
    val strict = run(Seq(5L, 6L), Seq((5L, 6L)), minPts = 2)
    assert(strict(5L) == ("noise", None))
    assert(strict(6L) == ("noise", None))
    val loose = run(Seq(5L, 6L), Seq((5L, 6L)), minPts = 1)
    assert(loose(5L) == ("core", Some(5L)))
    assert(loose(6L) == ("core", Some(5L)))
  }

  test("core bridge merges two triangles into one cluster; a " +
      "degree-1 tail stays border") {
    // triangles {1,2,3} and {10,11,12} joined through 7 (deg 2 ->
    // core): the core-core path 3-7-10 makes ONE component labeled
    // min core id 1. 20 hangs off 12 with a single edge -> border.
    val m = run(Seq(1L, 2L, 3L, 7L, 10L, 11L, 12L, 20L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (10L, 11L), (11L, 12L), (10L, 12L),
        (3L, 7L), (7L, 10L), (12L, 20L)))
    Seq(1L, 2L, 3L, 7L, 10L, 11L, 12L).foreach(v =>
      assert(m(v) == ("core", Some(1L)), s"vertex $v"))
    assert(m(20L) == ("border", Some(1L)))
  }

  test("two clusters stay separate when the bridge is only a border") {
    // triangles {1,2,3} and {10,11,12}; 7 touches ONLY core 3 ->
    // deg 1, border of cluster 1; clusters remain distinct
    val m = run(Seq(1L, 2L, 3L, 7L, 10L, 11L, 12L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (10L, 11L), (11L, 12L), (10L, 12L), (3L, 7L)))
    assert(Seq(1L, 2L, 3L).forall(m(_) == ("core", Some(1L))))
    assert(Seq(10L, 11L, 12L).forall(m(_) == ("core", Some(10L))))
    assert(m(7L) == ("border", Some(1L)))
  }

  test("duplicate/reversed pairs do not inflate degrees") {
    // edge list repeats (1,2) in both orientations: still deg 1 each
    val m = run(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L), (1L, 2L)))
    assert(m(1L) == ("noise", None))
    assert(m(2L) == ("noise", None))
  }
}
