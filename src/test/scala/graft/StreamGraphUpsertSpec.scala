package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.queries.PipelineQueries

/** [[PipelineQueries.streamGraphUpsert]] — the CDC-shaped graph-store
  * maintenance lifecycle: the final persisted store must equal the
  * DIRECT batch composition (occlusion-preserving append over the
  * diversified base, then tombstone delete with hole bridging over
  * the merged result), no tombstone survives anywhere, and capacity
  * holds — proving the foreachBatch adds-then-dels store discipline
  * loses nothing between ticks. Covers BOTH wave shapes: the gate's
  * separate add/del waves, and the real CDC shape — a single
  * micro-batch carrying both ops (adds applied first, then dels,
  * within one tick), followed by a second mixed wave whose adds walk
  * a store already containing the first wave's deletions. */
class StreamGraphUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables(spark, dir, "embeddings")
    .select($"vec_id", $"embedding")
  private lazy val standing =
    emb.filter(pmod($"vec_id", lit(10)) =!= 9)

  private def addOps(m: Long): DataFrame =
    emb.filter(pmod($"vec_id", lit(20)) === m)
      .select(lit("add").as("op"), $"vec_id", $"embedding")
  private def delOps(m: Long): DataFrame =
    emb.filter(pmod($"vec_id", lit(10)) === m)
      .select(lit("del").as("op"), $"vec_id",
        lit(null).cast("array<float>").as("embedding"))

  /** One batch APPEND tick: search-then-connect delta merged over
    * the store (dropped observability rows excluded from
    * write-back) — the foreachBatch add branch, replayed directly. */
  private def applyAdd(c: DataFrame, g: DataFrame, adds: DataFrame)
      : (DataFrame, DataFrame) = {
    val delta = Similarity.graphAppend(c, $"vec_id", $"embedding",
      g, adds, $"vec_id", $"embedding",
      k = 8, beam = 16, hops = 3, entries = 8)
    val touched = delta.filter($"src" === "updated")
      .select($"node_id").distinct()
    val g2 = delta.filter($"src" =!= "dropped")
      .select($"node_id", $"nbr_id", $"rank", $"cosine")
      .unionByName(g.join(touched, Seq("node_id"), "left_anti")
        .select($"node_id", $"nbr_id", $"rank", $"cosine"))
      .localCheckpoint(true)
    (c.unionByName(adds).localCheckpoint(true), g2)
  }

  /** One batch DELETE tick: tombstone + hole repair merged over the
    * store — the foreachBatch del branch, replayed directly. */
  private def applyDel(c: DataFrame, g: DataFrame, dels: DataFrame)
      : (DataFrame, DataFrame) = {
    val c2 = c.join(dels, Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    val rep = Similarity.graphDelete(c2, $"vec_id", $"embedding",
      g, dels, $"vec_id", k = 8)
    val keep = g.join(dels.select($"vec_id".as("node_id")),
      Seq("node_id"), "left_anti")
    val touched = keep.join(dels.select($"vec_id".as("nbr_id")),
        Seq("nbr_id"), "left_semi")
      .select($"node_id").distinct()
    val g2 = keep.join(touched, Seq("node_id"), "left_anti")
      .select($"node_id", $"nbr_id", $"rank", $"cosine")
      .unionByName(rep.filter($"src" =!= "dropped")
        .select($"node_id", $"nbr_id", $"rank", $"cosine"))
      .localCheckpoint(true)
    (c2, g2)
  }

  private def baseStore(): DataFrame = {
    val wide = Similarity.nnDescent(standing, $"vec_id", $"embedding",
      k = 16, rounds = 4)
    Similarity.diversifyGraph(standing, $"vec_id", $"embedding",
      wide, degree = 8).localCheckpoint(true)
  }

  private def assertStoreEquals(got: DataFrame, want: DataFrame)
      : Unit =
    assert(got.except(want).count() == 0L &&
      want.except(got).count() == 0L,
      "streaming upsert store diverged from the batch composition")

  test("streaming upsert store equals the batch append∘delete composition") {
    val got = PipelineQueries.streamGraphUpsert(spark, dir)
      .select($"node_id", $"nbr_id", $"rank", $"cosine").cache()
    val g0 = baseStore()
    val (c1, g1) = applyAdd(standing, g0,
      emb.filter(pmod($"vec_id", lit(20)) === 9))
    val (_, g2) = applyDel(c1, g1,
      emb.filter(pmod($"vec_id", lit(10)) === 3).select($"vec_id"))
    assertStoreEquals(got, g2)
    // contracts: no tombstone anywhere, capacity bound holds
    assert(got.filter($"node_id" % 10 === 3).count() == 0L)
    assert(got.filter($"nbr_id" % 10 === 3).count() == 0L)
    assert(got.groupBy($"node_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 8).count() == 0L)
  }

  test("mixed-tick CDC: both ops in one micro-batch, two waves") {
    // wave 1 carries adds (%20=9) AND dels (%10=3) in ONE batch;
    // wave 2 carries adds (%20=19) AND dels (%10=7) — its adds walk
    // a store already missing wave 1's deletions
    val got = PipelineQueries.streamGraphUpsertRun(spark, dir, Seq(
        addOps(9).unionByName(delOps(3)),
        addOps(19).unionByName(delOps(7))))
      .select($"node_id", $"nbr_id", $"rank", $"cosine").cache()
    // the adds-then-dels tick discipline, composed in batch
    val g0 = baseStore()
    val (c1, g1) = applyAdd(standing, g0,
      emb.filter(pmod($"vec_id", lit(20)) === 9))
    val (c2, g2) = applyDel(c1, g1,
      emb.filter(pmod($"vec_id", lit(10)) === 3).select($"vec_id"))
    val (c3, g3) = applyAdd(c2, g2,
      emb.filter(pmod($"vec_id", lit(20)) === 19))
    val (_, g4) = applyDel(c3, g3,
      emb.filter(pmod($"vec_id", lit(10)) === 7).select($"vec_id"))
    assertStoreEquals(got, g4)
    // neither deleted band survives; the wave-2 adds are wired in
    assert(got.filter($"node_id" % 10 === 3 || $"nbr_id" % 10 === 3)
      .count() == 0L)
    assert(got.filter($"node_id" % 10 === 7 || $"nbr_id" % 10 === 7)
      .count() == 0L)
    assert(got.filter($"node_id" % 20 === 19).count() > 0L)
    assert(got.groupBy($"node_id").agg(count(lit(1)).as("n"))
      .filter($"n" > 8).count() == 0L)
  }
}
