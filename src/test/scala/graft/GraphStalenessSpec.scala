package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.queries.ExtQueries

/** [[ExtQueries.graphStalenessReadout]] — the maintained-graph-store
  * staleness audit and its integer-predicate REBUILD flag: a healthy
  * store (identical to the fresh rebuild, all-base provenance) keeps
  * the flag at 0; a store whose adopted-edge share exceeds 2% flips
  * it; a store whose wiring decayed (walk recall more than 0.1 below
  * the fresh rebuild) flips it — the two planted degradations the
  * trigger exists to catch. */
class GraphStalenessSpec extends SparkSpec {
  import spark.implicits._

  // the clustered fixture: 10 clusters x 20 points, 8 dims
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

  private lazy val fresh = {
    val wide = Similarity.nnDescent(fixture, $"vec_id", $"embedding",
      k = 16, rounds = 2)
    Similarity.diversifyGraph(fixture, $"vec_id", $"embedding",
      wide, degree = 8).cache()
  }
  private lazy val queries = fixture.filter($"vec_id" < 20)

  private def flagOf(rows: org.apache.spark.sql.DataFrame): Long =
    rows.filter($"variant" === "rebuild")
      .select($"num").first().getLong(0)

  test("healthy store keeps the rebuild flag at 0") {
    val cls = fresh.withColumn("cls", lit("base"))
    val rows = ExtQueries.graphStalenessReadout(fixture, cls, fresh,
      queries).cache()
    assert(flagOf(rows) == 0L)
    // provenance readout: everything is base, share 1.0
    val base = rows.filter($"variant" === "edges_base").first()
    assert(base.getAs[Long]("num") == base.getAs[Long]("den"))
    // identical stores walk identically
    val wm = rows.filter($"variant" === "walk_maintained")
      .select($"num").first().getLong(0)
    val wf = rows.filter($"variant" === "walk_fresh")
      .select($"num").first().getLong(0)
    assert(wm == wf)
  }

  test("adopted-edge share above 2% flips the flag") {
    // plant ~12% adopted provenance on an otherwise healthy store:
    // the share predicate alone must fire (wiring is unchanged, so
    // the recall leg contributes nothing)
    val cls = fresh.withColumn("cls",
      when($"nbr_id" % 8 === 0, lit("adopted")).otherwise(lit("base")))
    val rows = ExtQueries.graphStalenessReadout(fixture, cls, fresh,
      queries).cache()
    val ad = rows.filter($"variant" === "edges_adopted").first()
    assert(ad.getAs[Long]("num") * 50 > ad.getAs[Long]("den"),
      "fixture failed to plant > 2% adopted share")
    assert(flagOf(rows) == 1L)
  }

  test("decayed wiring (recall delta > 0.1 vs fresh) flips the flag") {
    // junk adjacency: every list collapses to one cross-cluster
    // edge — the walk can't leave the entry neighborhoods, recall
    // craters vs the fresh rebuild; provenance stays clean so only
    // the recall predicate can fire
    val bad = fixture.select($"vec_id".as("node_id"))
      .withColumn("nbr_id", ($"node_id" + 100) % 200)
      .withColumn("cls", lit("base"))
    val rows = ExtQueries.graphStalenessReadout(fixture, bad, fresh,
      queries).cache()
    val wm = rows.filter($"variant" === "walk_maintained")
      .select($"num").first().getLong(0)
    val wf = rows.filter($"variant" === "walk_fresh")
      .select($"num").first().getLong(0)
    assert(wf > wm, "fresh rebuild did not beat the junk store")
    assert(flagOf(rows) == 1L)
  }
}
