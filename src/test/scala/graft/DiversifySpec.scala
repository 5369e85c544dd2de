package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** [[Similarity.diversifyGraph]] — the order-free occlusion rule
  * (HNSW/NSG neighbor selection): kept edges satisfy the contract
  * (no kept neighbor is covered by a higher-ranked one), the degree
  * bound holds, survivors keep their relative order, and on the
  * clustered fixture pruning actually drops redundant same-cluster
  * edges (the lists are occlusion-dense by construction). */
class DiversifySpec extends SparkSpec {
  import spark.implicits._

  // the NnDescent/GraphAppend clustered fixture: 10 clusters x 20
  // points, 8 dims — within-cluster cosines near 1, so most of a
  // k=16 list is mutually occluding
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

  private lazy val graph = Similarity.nnDescent(fixture, $"vec_id",
    $"embedding", k = 16, rounds = 2).cache()
  private lazy val pruned = Similarity.diversifyGraph(fixture,
    $"vec_id", $"embedding", graph, degree = 8).cache()

  test("degree bound and rank renumbering hold") {
    val per = pruned.groupBy($"node_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"))
    assert(per.filter($"n" > 8L).count() == 0L)
    // ranks are 1..n contiguous per node
    assert(per.filter($"mr" =!= $"n").count() == 0L)
    // every kept edge came from the input graph
    assert(pruned.select($"node_id", $"nbr_id")
      .except(graph.select($"node_id", $"nbr_id")).count() == 0L)
  }

  test("no kept edge is occluded by a higher-INPUT-ranked neighbor") {
    // re-derive input ranks for kept edges, then assert the one-shot
    // rule directly: for kept b, no higher-input-ranked b' (kept or
    // not) has cos(b', b) > cos(node, b)
    val inRank = graph.select($"node_id", $"nbr_id",
      $"rank".as("in_rank"))
    val kept = pruned.join(inRank, Seq("node_id", "nbr_id"))
    val higher = kept.as("x").join(inRank.as("y"),
        col("x.node_id") === col("y.node_id") &&
          col("y.in_rank") < col("x.in_rank"))
      .select(col("x.node_id").as("node_id"),
        col("x.nbr_id").as("b"), col("x.cosine").as("cos_ab"),
        col("y.nbr_id").as("bp"))
    val vecs = fixture.select($"vec_id", $"embedding")
    def side(idName: String, v: String, sn: String) =
      Similarity.vectorsWithNorm(vecs, $"vec_id", $"embedding",
        idName, v, sn)
    val viol = higher
      .join(side("b", "bv", "sb"), Seq("b"))
      .join(side("bp", "pv", "sp"), Seq("bp"))
      .filter(graft.functions.VecKernels.vecDotDec($"bv", $"pv")
        .cast("double") / ($"sb" * $"sp") > $"cos_ab")
    assert(viol.count() == 0L,
      "kept edge occluded by a higher-ranked neighbor")
  }

  test("clustered lists actually prune (occlusion-dense by design)") {
    val rawDeg = graph.filter($"rank" <= 8).count()
    val divDeg = pruned.count()
    assert(divDeg < rawDeg,
      s"expected pruning below the rank-8 cut: $divDeg vs $rawDeg")
  }
}
