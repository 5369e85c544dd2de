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

  test("deterministic: two runs agree exactly") {
    val edges = (1L to 20L).flatMap(i =>
      Seq((i, (i % 20) + 1), (i, ((i + 2) % 20) + 1)))
    assert(lpa(edges, 3) == lpa(edges, 3))
  }
}
