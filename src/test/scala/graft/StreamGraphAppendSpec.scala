package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.queries.PipelineQueries

/** [[PipelineQueries.streamGraphAppend]] — the streaming graph-index
  * maintenance lifecycle: the final persisted store after two
  * file-arrival micro-batch insertion waves must equal the DIRECT
  * two-stage batch composition (append wave 1 over the base graph,
  * merge, append wave 2 over the merged graph with entries from the
  * grown corpus) — the in-engine twin of the gate's unrolled DuckDB
  * oracle, proving the foreachBatch store discipline (read → insert
  * → localCheckpoint → overwrite) loses nothing between ticks. */
class StreamGraphAppendSpec extends SparkSpec {
  import spark.implicits._

  test("streaming store equals the two-stage batch composition") {
    val dir = "/root/testdata/sf0.001"
    val got = PipelineQueries.streamGraphAppend(spark, dir)
      .select($"node_id", $"nbr_id", $"rank", $"cosine")
    val emb = Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val standing = emb.filter(pmod($"vec_id", lit(10)) =!= 9)
    def appendMerge(corpus: DataFrame, graph: DataFrame,
        batch: DataFrame): DataFrame = {
      val delta = Similarity.graphAppend(corpus, $"vec_id",
        $"embedding", graph, batch, $"vec_id", $"embedding",
        k = 8, beam = 16, hops = 3, entries = 8)
      val touched = delta.filter($"src" === "updated")
        .select($"node_id").distinct()
      delta.select($"node_id", $"nbr_id", $"rank", $"cosine")
        .unionByName(graph.join(touched, Seq("node_id"), "left_anti")
          .select($"node_id", $"nbr_id", $"rank", $"cosine"))
        .localCheckpoint(true)
    }
    // the standing store follows the deployed lifecycle since round
    // 17: build wide (k = 16, 4 rounds), occlusion-prune to degree 8
    val wide = Similarity.nnDescent(standing, $"vec_id", $"embedding",
      k = 16, rounds = 4)
    val g0 = Similarity.diversifyGraph(standing, $"vec_id",
      $"embedding", wide, degree = 8)
    val wave1 = emb.filter(pmod($"vec_id", lit(20)) === 9)
    val wave2 = emb.filter(pmod($"vec_id", lit(20)) === 19)
    val m1 = appendMerge(standing, g0, wave1)
    val m2 = appendMerge(standing.unionByName(wave1), m1, wave2)
    assert(got.except(m2).count() == 0L &&
      m2.except(got).count() == 0L,
      "streaming store diverged from the batch composition")
    // and the store is a well-formed graph: every corpus node has a
    // list, none exceeds k
    val perNode = got.groupBy($"node_id").agg(count(lit(1)).as("n"))
    assert(perNode.filter($"n" > 8).count() == 0L)
    assert(perNode.count() == emb.count())
  }
}
