package graft

import org.apache.spark.sql.functions.col

import graft.ext.Graph

/** [[graft.ext.Graph.labelPropagation]] — fixed-round synchronous
  * LPA with min-label ties on hand graphs. */
class LpaSpec extends SparkSpec {
  import spark.implicits._

  private def lpa(pairs: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] =
    Graph.labelPropagation(pairs.toDF("a", "b"), col("a"), col("b"),
      rounds).as[(Long, Long)].collect().toMap

  test("two cliques with one bridge stay two communities") {
    // K4 {1..4} and K4 {10..13} joined by a single edge 4-10:
    // min labels 1 and 10 win inside each clique; the lone bridge
    // vote can't overturn three intra-clique votes
    def k4(vs: Seq[Long]) =
      for (i <- vs.indices; j <- i + 1 until vs.size)
        yield (vs(i), vs(j))
    val edges = k4(Seq(1L, 2L, 3L, 4L)) ++
      k4(Seq(10L, 11L, 12L, 13L)) :+ (4L, 10L)
    val m = lpa(edges, rounds = 3)
    assert(Seq(1L, 2L, 3L, 4L).map(m).toSet == Set(1L))
    assert(Seq(10L, 11L, 12L, 13L).map(m).toSet == Set(10L))
  }

  test("star graph: one round makes leaves adopt the hub's label") {
    // hub 5, leaves 6,7,8: after round 1 every leaf's only neighbor
    // label is 5; the hub sees labels {6,7,8} each once -> min = 6
    val m = lpa(Seq((5L, 6L), (5L, 7L), (5L, 8L)), rounds = 1)
    assert(m(6L) == 5L && m(7L) == 5L && m(8L) == 5L)
    assert(m(5L) == 6L)
  }

  test("kCore: a chain fully dissolves, a triangle with a tail " +
      "keeps only the triangle") {
    // chain 1-2-3-4 at k=2: endpoints peel, then the middle — empty.
    val chain = Graph.kCore(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b"),
      col("a"), col("b"), k = 2, rounds = 4)
      .as[(Long, Long)].collect()
    assert(chain.isEmpty)
    // triangle {1,2,3} + tail 3-4-5: tail peels over TWO rounds
    // (5 first, then 4), triangle survives with degree 2 each
    val tri = Graph.kCore(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
        .toDF("a", "b"),
      col("a"), col("b"), k = 2, rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(tri.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: the gate's 6-round budget is converged on sf0.001 " +
      "(round 6 == round 7)") {
    val emb = sf("embeddings")
    def pairs = graft.ext.Similarity.lshNearDupPairs(emb,
      col("vec_id"), col("embedding"), dim = 64, numPlanes = 8,
      threshold = 0.2, numTables = 2, maxBucketSize = 1000)
    def run(r: Int) = Graph.kCore(pairs, col("id1"), col("id2"),
      k = 2, rounds = r).as[(Long, Long)].collect().toSet
    assert(run(6) == run(7))
  }

  test("deterministic: two runs agree exactly") {
    val edges = (1L to 20L).flatMap(i =>
      Seq((i, (i % 20) + 1), (i, ((i + 2) % 20) + 1)))
    assert(lpa(edges, 3) == lpa(edges, 3))
  }
}
