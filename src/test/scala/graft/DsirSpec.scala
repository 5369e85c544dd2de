package graft

import org.apache.spark.sql.functions._

import graft.ext.Lm

/** [[Lm.dsirWeights]]/[[Lm.dsirKeep]] on a planted two-domain
  * fixture: target-like documents must up-sample and off-domain
  * documents down-sample — by CONTENT, not by the target label (the
  * point of DSIR: the label only defines the target model; selection
  * then applies to any raw document). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // domain A: "alpha"-family bigrams; domain B: "beta"-family.
  // 40 target docs (domain A, flagged), 40 raw domain-B docs, plus
  // 10 UNFLAGGED domain-A docs — the interesting band.
  private lazy val fixture = {
    def doc(words: Seq[String], j: Int): String =
      (0 until 12).flatMap(i => words.map(w => s"$w${(i + j) % 3}"))
        .mkString(" ")
    val a = (0 until 40).map(j =>
      (j.toLong, doc(Seq("alpha", "omega", "kappa"), j), true))
    val b = (0 until 40).map(j =>
      (100L + j, doc(Seq("beta", "gamma", "delta"), j), false))
    val aUnflagged = (0 until 10).map(j =>
      (200L + j, doc(Seq("alpha", "omega", "kappa"), j), false))
    (a ++ b ++ aUnflagged).toDF("doc_id", "text", "is_target")
  }

  private lazy val keepByDoc: Map[Long, Boolean] = {
    val w = Lm.dsirWeights(fixture, $"doc_id", $"text", $"is_target")
      .withColumnRenamed("id", "doc_id")
    fixture.join(w, Seq("doc_id"), "left_outer")
      .select($"doc_id",
        coalesce(Lm.dsirKeep($"doc_id", $"num", $"den"), lit(false)))
      .as[(Long, Boolean)].collect().toMap
  }

  test("target-domain docs up-sample, off-domain docs down-sample") {
    val aShare = (0L until 40L).count(keepByDoc) / 40.0
    val bShare = (100L until 140L).count(keepByDoc) / 40.0
    assert(aShare >= 0.9, s"target-domain kept share $aShare")
    assert(bShare <= 0.6, s"off-domain kept share $bShare")
    assert(aShare > bShare + 0.3)
  }

  test("selection is content-based: unflagged target-like docs up-sample") {
    val share = (200L until 210L).count(keepByDoc) / 10.0
    assert(share >= 0.9, s"unflagged target-like kept share $share")
  }

  test("weights are deterministic and feature-less docs are weight-0") {
    val docs = fixture.unionByName(
      Seq((300L, "solo", false)).toDF("doc_id", "text", "is_target"))
    def w() = Lm.dsirWeights(docs, $"doc_id", $"text", $"is_target")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(w() == w())
    // the 1-token doc emits no bigram features at all
    assert(!w().exists(_._1 == 300L))
  }
}
