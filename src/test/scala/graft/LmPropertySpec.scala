package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.{Dedup, Lm}

/** Property-based invariants for the bigram-LM family on RANDOM
  * corpora (the gates cover one fixed testdata shape):
  *   - scoring is total and bounded: every doc appears once, with
  *     n_bigrams == max(len−1, 0) and 0 < q ≤ 2²⁰ per bigram;
  *   - count-frame merging is associative: any 3-way split of a
  *     corpus, merged in either association order, equals the
  *     recount on the union (the lemma `lm_incremental_update`
  *     leans on);
  *   - releaseDiff classifies every byte-identical incoming doc
  *     `exact`, on any corpus.
  * Raw ScalaCheck Gens from fixed seeds (offline classpath; failures
  * reproduce exactly). */
class LmPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  private val docGen: Gen[String] = for {
    len <- Gen.frequency(1 -> Gen.const(0), 2 -> Gen.choose(1, 2),
      5 -> Gen.choose(3, 20))
    toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
  } yield toks.mkString(" ")

  private val corpusGen: Gen[List[String]] =
    Gen.choose(5, 15).flatMap(k => Gen.listOfN(k, docGen))

  test("scoreDocs is total and per-bigram q is bounded by 2^20") {
    for (seed <- 1L to 4L) {
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Lm.scoreDocs(docs, $"doc_id", $"text").collect()
      assert(out.length === texts.length, s"seed $seed")
      for (r <- out) {
        val len = texts(r.getLong(0).toInt).split("\\s+")
          .count(_.nonEmpty)
        val expected = math.max(if (len == 0) 1 - 1 else len - 1, 0)
        assert(r.getLong(1) === expected.toLong,
          s"seed $seed doc ${r.getLong(0)}")
        // q_sum <= n * 2^20 (probabilities never exceed 1)
        assert(r.getLong(2) <= r.getLong(1) * 1048576L, s"seed $seed")
        assert(r.getLong(2) >= 0L)
      }
    }
  }

  test("mergeCounts is associative across any 3-way split") {
    for (seed <- 10L to 12L) {
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def counts(part: Int) = Lm.bigramCounts(Lm.seqBigrams(
        docs.filter($"doc_id" % 3 === part), $"doc_id", $"text"))
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val leftAssoc = toMap(Lm.mergeCounts(
        Lm.mergeCounts(counts(0), counts(1), Seq("w1", "w2"), "c12"),
        counts(2), Seq("w1", "w2"), "c12"))
      val rightAssoc = toMap(Lm.mergeCounts(counts(0),
        Lm.mergeCounts(counts(1), counts(2), Seq("w1", "w2"), "c12"),
        Seq("w1", "w2"), "c12"))
      val full = toMap(Lm.bigramCounts(
        Lm.seqBigrams(docs, $"doc_id", $"text")))
      assert(leftAssoc === full, s"seed $seed")
      assert(rightAssoc === full, s"seed $seed")
    }
  }

  test("trigram backoff: per-tier q bounds hold on random corpora") {
    // tier 3: q <= 2^20 (probability); tier 2: q <= (2/5)·2^20;
    // tier 1: q <= (4/25)·2^20 — the backoff weights really do
    // discount, whatever the corpus
    for (seed <- 30L to 32L) {
      val texts = sample(corpusGen, seed)
      val spark2 = spark
      import spark2.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "xx") }
        .toDF("doc_id", "text", "lang")
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_lmprop_$seed").toString
      docs.write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val out = graft.queries.TrainQueries
        .lmTrigramBackoff(spark, tmp).collect()
      val bound = Map(3L -> 1048576L, 2L -> 1048576L * 2 / 5,
        1L -> 1048576L * 4 / 25, 0L -> 0L)
      for (r <- out) {
        val tier = r.getLong(1)
        // q_sum <= n_grams * per-tier max q
        assert(r.getLong(3) <= r.getLong(2) * bound(tier),
          s"seed $seed tier $tier")
      }
    }
  }

  test("releaseDiff: byte-identical incoming docs always classify exact") {
    for (seed <- 20L to 22L) {
      val texts = sample(corpusGen, seed).filter(_.nonEmpty)
      if (texts.nonEmpty) {
        // standing = originals at even ids; incoming = copies at ids
        // ≡ 3 mod 4 (plus one unrelated doc)
        val standing = texts.zipWithIndex
          .map { case (t, i) => (i.toLong * 4, t) }
        val copies = texts.zipWithIndex
          .map { case (t, i) => (i.toLong * 4 + 3, t) }
        val docs = (standing ++ copies).toDF("doc_id", "text")
        val out = Dedup.releaseDiff(docs, $"doc_id", $"text",
          $"doc_id" % 4 === 3).collect()
        assert(out.nonEmpty, s"seed $seed")
        assert(out.forall(_.getString(1) == "exact"), s"seed $seed")
      }
    }
  }
}
