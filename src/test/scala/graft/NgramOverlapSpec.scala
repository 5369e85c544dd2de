package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** [[Corpus.ngramOverlapCounts]] / [[Corpus.overlapScores]] — the
  * clipped-count contract (BLEU's repeated-gram fix), the exact
  * F1 = 2m/(tc+tr) identity on a textbook pair, and the degenerate
  * rows (zero overlap, too short for bigrams) staying visible. */
class NgramOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def score(cand: String, ref: String, n: Int) = {
    val docs = Seq((0L, cand), (1L, ref)).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L)).toDF("cand_id", "ref_id")
    Corpus.overlapScores(Corpus.ngramOverlapCounts(
      docs, $"doc_id", $"text", pairs, n), "s").collect().head
  }

  test("textbook pair: ROUGE-1 and ROUGE-2 exact values") {
    val r1 = score("the cat sat on the mat", "the cat on the mat", 1)
    assert(r1.getAs[Long]("s_match") == 5L)     // the:2 cat:1 on:1 mat:1
    assert(r1.getAs[Long]("s_tot_c") == 6L)
    assert(r1.getAs[Long]("s_tot_r") == 5L)
    assert(r1.getAs[Double]("s_p") == 5.0 / 6.0)
    assert(r1.getAs[Double]("s_r") == 1.0)
    assert(r1.getAs[Double]("s_f1") == 10.0 / 11.0)
    val r2 = score("the cat sat on the mat", "the cat on the mat", 2)
    assert(r2.getAs[Long]("s_match") == 3L)  // the cat / on the / the mat
    assert(r2.getAs[Double]("s_p") == 3.0 / 5.0)
    assert(r2.getAs[Double]("s_r") == 3.0 / 4.0)
    assert(r2.getAs[Double]("s_f1") == 6.0 / 9.0)
  }

  test("clipping caps repeated grams at the reference count") {
    val r = score("the the the the", "the cat", 1)
    assert(r.getAs[Long]("s_match") == 1L) // min(4, 1), not 4
    assert(r.getAs[Double]("s_p") == 0.25)
    assert(r.getAs[Double]("s_f1") == 2.0 / 6.0)
  }

  test("corpus BLEU-2-lite: exact value on a planted two-doc corpus") {
    // doc 0 (cand) vs doc 1 (ref): r1 m=5 c=6 r=5; r2 m=3 c=5.
    // p1 = 5/6, p2 = 3/5, brevity = 1 (c > r capped), bleu = sqrt(p1*p2)
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((0L, "the cat sat on the mat"),
      (1L, "the cat on the mat")).toDF("doc_id", "text")
    val row = graft.queries.CorpusQueries
      .evalBleuCorpusOn(docs).collect().head
    assert(row.getAs[Long]("n_pairs") == 1L)
    assert(row.getAs[Double]("p1") == 5.0 / 6.0)
    assert(row.getAs[Double]("p2") == 3.0 / 5.0)
    assert(row.getAs[Double]("brevity") == 1.0)
    assert(row.getAs[Double]("bleu2_lite") ==
      1.0 * math.sqrt((5.0 / 6.0) * (3.0 / 5.0)))
  }

  test("zero overlap and no-bigram docs keep their rows at 0") {
    val z = score("a b", "c d", 1)
    assert(z.getAs[Long]("s_match") == 0L &&
      z.getAs[Double]("s_f1") == 0.0)
    val s = score("one", "two", 2) // neither side has a bigram
    assert(s.getAs[Long]("s_tot_c") == 0L &&
      s.getAs[Long]("s_tot_r") == 0L &&
      s.getAs[Double]("s_p") == 0.0 && s.getAs[Double]("s_r") == 0.0 &&
      s.getAs[Double]("s_f1") == 0.0)
  }
}
