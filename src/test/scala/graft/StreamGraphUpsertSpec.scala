package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.queries.PipelineQueries

/** [[PipelineQueries.streamGraphUpsert]] — the CDC-shaped graph-store
  * maintenance lifecycle: the final persisted store after an append
  * tick and a delete tick must equal the DIRECT batch composition
  * (occlusion-preserving append over the diversified base, then
  * tombstone delete with hole bridging over the merged result), no
  * tombstone survives anywhere, and capacity holds — proving the
  * foreachBatch adds-then-dels store discipline loses nothing
  * between ticks. */
class StreamGraphUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("streaming upsert store equals the batch append∘delete composition") {
    val dir = "/root/testdata/sf0.001"
    val got = PipelineQueries.streamGraphUpsert(spark, dir)
      .select($"node_id", $"nbr_id", $"rank", $"cosine").cache()
    val emb = Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val standing = emb.filter(pmod($"vec_id", lit(10)) =!= 9)
    val wide = Similarity.nnDescent(standing, $"vec_id", $"embedding",
      k = 16, rounds = 4)
    val g0 = Similarity.diversifyGraph(standing, $"vec_id",
      $"embedding", wide, degree = 8).localCheckpoint(true)
    // append tick
    val adds = emb.filter(pmod($"vec_id", lit(20)) === 9)
    val delta = Similarity.graphAppend(standing, $"vec_id",
      $"embedding", g0, adds, $"vec_id", $"embedding",
      k = 8, beam = 16, hops = 3, entries = 8)
    val touchedA = delta.filter($"src" === "updated")
      .select($"node_id").distinct()
    val g1 = delta.select($"node_id", $"nbr_id", $"rank", $"cosine")
      .unionByName(g0.join(touchedA, Seq("node_id"), "left_anti")
        .select($"node_id", $"nbr_id", $"rank", $"cosine"))
      .localCheckpoint(true)
    val c1 = standing.unionByName(adds)
    // delete tick
    val dels = emb.filter(pmod($"vec_id", lit(10)) === 3)
      .select($"vec_id")
    val c2 = c1.join(dels, Seq("vec_id"), "left_anti")
    val rep = Similarity.graphDelete(c2, $"vec_id", $"embedding",
      g1, dels, $"vec_id", k = 8)
    val keep = g1.join(dels.select($"vec_id".as("node_id")),
      Seq("node_id"), "left_anti")
    val touchedD = keep.join(dels.select($"vec_id".as("nbr_id")),
        Seq("nbr_id"), "left_semi")
      .select($"node_id").distinct()
    val g2: DataFrame = keep
      .join(touchedD, Seq("node_id"), "left_anti")
      .select($"node_id", $"nbr_id", $"rank", $"cosine")
      .unionByName(rep.select($"node_id", $"nbr_id", $"rank",
        $"cosine"))
      .localCheckpoint(true)
    assert(got.except(g2).count() == 0L &&
      g2.except(got).count() == 0L,
      "streaming upsert store diverged from the batch composition")
    // contracts: no tombstone anywhere, capacity bound holds
    assert(got.filter($"node_id" % 10 === 3).count() == 0L)
    assert(got.filter($"nbr_id" % 10 === 3).count() == 0L)
    assert(got.groupBy($"node_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 8).count() == 0L)
  }
}
