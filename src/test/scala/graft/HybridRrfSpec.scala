package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtQueries

/** [[ExtQueries.hybridRrfFusion]] — the RRF fusion contract on the
  * sf0.001 fixture: fused scores decompose exactly into the two
  * reciprocal-rank terms (absent list = exactly 0), ranks are
  * contiguous per query, and every fused row came from at least one
  * source list. */
class HybridRrfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out =
    ExtQueries.hybridRrfFusion(spark, "/root/testdata/sf0.001").cache()

  test("rrf decomposes exactly into the two rank terms") {
    def term(r: org.apache.spark.sql.Column) =
      when(r > 0, lit(1.0) / (lit(60.0) + r.cast("double")))
        .otherwise(lit(0.0))
    val bad = out.filter(
      col("rrf_score") =!= term(col("lex_rank")) + term(col("vec_rank")))
    assert(bad.count() == 0L, "rrf_score not the exact two-term sum")
    // membership: every row is in at least one list
    assert(out.filter(col("lex_rank") === 0 && col("vec_rank") === 0)
      .count() == 0L)
  }

  test("per-query lists are bounded and contiguously ranked") {
    val per = out.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"),
        min($"rank").as("lo"))
    assert(per.filter($"n" > 10L || $"mr" =!= $"n" || $"lo" =!= 1L)
      .count() == 0L)
    assert(out.filter($"query_id" >= 10).count() === 0L)
    // fusion monotonicity within a query: ranks follow rrf_score
    // (desc) with doc_id tie-break — no row may outrank a higher
    // rrf_score
    val inv = out.as("x").join(out.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.rank") < col("y.rank") &&
          col("x.rrf_score") < col("y.rrf_score"))
    assert(inv.count() == 0L, "rank order violates rrf_score order")
  }

  test("served variant keeps the contract; overlap audit is exact") {
    val served = ExtQueries
      .hybridRrfServed(spark, "/root/testdata/sf0.001").cache()
    val per = served.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"),
        min($"rank").as("lo"))
    assert(per.filter($"n" > 10L || $"mr" =!= $"n" || $"lo" =!= 1L)
      .count() == 0L)
    assert(served.filter(col("lex_rank") === 0 && col("vec_rank") === 0)
      .count() == 0L)
    // the gated overlap readout equals the directly-computed
    // brute-fused ∩ served-fused intersection
    val direct = out.select($"query_id", $"doc_id")
      .join(served.select($"query_id", $"doc_id"),
        Seq("query_id", "doc_id")).count()
    val ov = ExtQueries
      .hybridRrfServedOverlap(spark, "/root/testdata/sf0.001")
      .collect()(0)
    assert(ov.getAs[Long]("n_overlap") == direct)
    assert(ov.getAs[Long]("n_possible") ==
      ov.getAs[Long]("n_queries") * 10)
  }
}
