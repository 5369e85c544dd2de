package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtQueries

/** [[ExtQueries.serveRerankMmr]] — the rerank→MMR tail of the
  * end-to-end serving composition (`serve_e2e`), driven over a
  * hand-built candidate frame so every stage-interface contract is
  * checkable: the per-query rerank cut respects (score DESC, doc_id
  * ASC), the MMR stage returns contiguous rnk 1..k per query with
  * pick 1 = λ·(max rerank score), the funnel never widens, and the
  * whole tail is deterministic (two runs byte-equal). */
class ServeE2eSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables(spark, dir, "documents")
  // two queries × 10 candidates each, ids interleaved so the two
  // groups don't share doc order
  private lazy val cand = (0 until 10).flatMap(i =>
      Seq((1L, i.toLong * 2), (2L, i.toLong * 2 + 1)))
    .toDF("query_id", "doc_id")

  private lazy val out = {
    val (r, f) = ExtQueries.serveRerankMmr(docs, cand)
    (r.cache(), f.cache())
  }

  test("rerank cut keeps the per-query top-8 in (score, id) order") {
    val (reranked, _) = out
    assert(reranked.groupBy($"query_id").agg(count(lit(1)).as("n"))
      .filter($"n" =!= 8).count() == 0L)
    // nothing outside the cut outscores anything inside it
    val all = cand.join(docs, "doc_id")
      .select($"query_id", $"doc_id")
    val outside = all.join(reranked.select($"query_id", $"doc_id"),
      Seq("query_id", "doc_id"), "left_anti")
    assert(outside.count() == (all.count() - reranked.count()))
  }

  test("MMR returns contiguous rnk 1..5, first pick = λ·max score") {
    val (reranked, fin) = out
    assert(fin.groupBy($"query_id").agg(count(lit(1)).as("n"),
        max($"rnk").as("m"))
      .filter($"n" =!= 5 || $"m" =!= 5).count() == 0L)
    // final picks are a subset of the reranked candidates
    assert(fin.select($"query_id", $"doc_id")
      .join(reranked.select($"query_id", $"doc_id"),
        Seq("query_id", "doc_id"), "left_anti").count() == 0L)
    // greedy pick 1 is pure relevance at λ = 0.5
    val first = fin.filter($"rnk" === 1)
      .select($"query_id", $"doc_id", $"mmr_score")
    val best = reranked.groupBy($"query_id")
      .agg(max($"rerank_score").as("mx"))
    val bad = first.join(best, "query_id")
      .filter(abs($"mmr_score" - $"mx" * 0.5) > 1e-12)
    assert(bad.count() == 0L)
  }

  test("the composition tail is deterministic") {
    val (_, f1) = ExtQueries.serveRerankMmr(docs, cand)
    val (_, f2) = ExtQueries.serveRerankMmr(docs, cand)
    assert(f1.except(f2).count() == 0L &&
      f2.except(f1).count() == 0L)
  }
}
