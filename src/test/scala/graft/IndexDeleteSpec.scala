package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** DELETE lifecycle for the row-shaped persisted ANN index stores
  * ([[Similarity.compactIndexRows]] + the serving-time tombstone
  * mask): compaction drops exactly the tombstoned ids and collapses
  * replayed-append duplicates, equaling the clean live table; the
  * masked IVF probe and the masked PQ ADC serve never return a
  * tombstoned id while the stored table still physically holds its
  * rows — the deleted-never-served contract the
  * `ann_ivf_delete_serve` / `ann_pq_delete_serve` gates pin at
  * corpus scale. */
class IndexDeleteSpec extends SparkSpec {
  import spark.implicits._

  test("compactIndexRows drops tombstones and collapses replays") {
    val stored = Seq((1L, 10L), (2L, 11L), (3L, 10L), (4L, 12L))
      .toDF("nbr_id", "cell_id")
    val dirty = stored.unionByName(stored.filter($"nbr_id" <= 2))
    val tombs = Seq(3L).toDF("vec_id")
    val out = Similarity.compactIndexRows(dirty, tombs, $"vec_id")
      .cache()
    assert(out.filter($"nbr_id" === 3L).count() == 0L)
    val clean = stored.filter($"nbr_id" =!= 3L)
    assert(out.except(clean).count() == 0L &&
      clean.except(out).count() == 0L,
      "compaction did not equal the clean live table")
  }

  private val dir = "/root/testdata/sf0.001"

  test("masked IVF probe never serves a tombstone") {
    val emb = Tables(spark, dir, "embeddings")
    val (cent, assign) = Similarity.buildIvfIndex(emb, $"vec_id",
      $"embedding", numCells = 16, iters = 1, sampleMod = 4)
    val tombs = emb.filter($"vec_id" % 10 === 6)
      .select($"vec_id".as("nbr_id"))
    // the stored table KEEPS the deleted rows; the mask is the
    // query-path anti-join
    val masked = assign.join(tombs, Seq("nbr_id"), "left_anti")
    val served = Similarity.ivfTopKFromIndex(emb, $"vec_id",
      $"embedding", emb.filter($"vec_id" < 10), $"vec_id",
      $"embedding", k = 10, nProbe = 4, cent, masked).cache()
    assert(served.filter($"nbr_id" % 10 === 6).count() == 0L)
    // the mask only removes the tombstoned band — every query still
    // fills its top-10 from the live corpus
    assert(served.groupBy($"query_id").agg(count(lit(1)).as("n"))
      .filter($"n" =!= 10).count() == 0L)
  }

  test("masked PQ ADC never serves a tombstone") {
    val emb = Tables(spark, dir, "embeddings")
    val (cbs, codes) = Similarity.buildPqIndex(emb, $"vec_id",
      $"embedding", m = 4, ksub = 8, iters = 1, sampleMod = 4)
    val queries = emb.filter($"vec_id" < 5)
    val tombs = emb.filter($"vec_id" % 10 === 6)
      .select($"vec_id".as("nbr_id"))
    val cand = emb.select($"vec_id".as("nbr_id"))
      .join(tombs, Seq("nbr_id"), "left_anti")
      .crossJoin(broadcast(queries.select($"vec_id".as("query_id"))))
    val served = Similarity.pqAdcTopK(cand, codes,
      Similarity.pqAdcTable(queries, $"vec_id", $"embedding", cbs),
      k = 10).cache()
    assert(served.filter($"nbr_id" % 10 === 6).count() == 0L)
    assert(served.groupBy($"query_id").agg(count(lit(1)).as("n"))
      .filter($"n" =!= 10).count() == 0L)
  }
}
