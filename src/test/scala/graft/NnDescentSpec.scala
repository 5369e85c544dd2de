package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** [[Similarity.nnDescent]] on a planted CLUSTERED fixture — the
  * strong-structure case the near-uniform gate corpus can't show:
  * with real neighborhoods, the local-join rounds converge fast and
  * the k-NN graph stays inside clusters. Also pins determinism (two
  * runs byte-equal) and the round-0 = scored-ring-init contract. */
class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  // 10 clusters x 20 points in 8 dims: cluster c centers on axis
  // pair (c % 4, 4 + c % 4) with a small deterministic per-point
  // wobble — within-cluster cosine >> cross-cluster cosine.
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

  test("clustered fixture: 2 rounds reach >= 0.9 recall@8 vs exact") {
    val truth = Similarity.bruteForceKnnTruth(fixture, $"vec_id",
        $"embedding", fixture, $"vec_id", $"embedding", 8)
      .select($"query_id", $"nbr_id")
    val got = Similarity.nnDescent(fixture, $"vec_id", $"embedding",
        k = 8, rounds = 2)
      .select($"node_id".as("query_id"), $"nbr_id")
    val hits = got.join(truth, Seq("query_id", "nbr_id"), "left_semi")
      .count()
    val possible = truth.count()
    assert(possible == 200L * 8)
    val recall = hits.toDouble / possible
    assert(recall >= 0.9, s"recall $recall on planted clusters")
  }

  test("converged neighbors stay within the planted cluster") {
    val got = Similarity.nnDescent(fixture, $"vec_id", $"embedding",
        k = 8, rounds = 3)
      .select($"node_id", $"nbr_id")
      .as[(Long, Long)].collect()
    val crossCluster = got.count { case (a, b) => a / 20 != b / 20 }
    // clusters have 20 members and k = 8, so a converged graph has
    // every neighbor in-cluster; allow a sliver for wobble ties
    assert(crossCluster <= got.length / 20,
      s"$crossCluster of ${got.length} edges cross clusters")
  }

  test("deterministic: two runs byte-equal; round 0 is the scored ring") {
    def run() = Similarity.nnDescent(fixture, $"vec_id", $"embedding",
        k = 8, rounds = 1)
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
    assert(run().toSeq == run().toSeq)
    val init = Similarity.nnDescent(fixture, $"vec_id", $"embedding",
        k = 8, rounds = 0)
      .select($"node_id", $"nbr_id").as[(Long, Long)].collect().toSet
    // ring init of node a holds exactly the +-4 id-ring neighbors
    // (ids are dense here, so rank == id)
    val expected = (for {
      a <- 0L until 200L
      o <- Seq(-4, -3, -2, -1, 1, 2, 3, 4)
    } yield (a, (a + o + 200) % 200)).toSet
    assert(init == expected)
  }
}
