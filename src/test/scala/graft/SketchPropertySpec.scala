package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.Dedup

/** Property-based invariants for the round-9 similarity/sketch
  * operators, on RANDOM corpora rather than the one fixed testdata
  * shape the gates cover:
  *   - the AllPairs/PPJoin prefix plan finds exactly the pairs the
  *     all-pairs baseline finds, at any threshold (the losslessness
  *     lemma exercised across degenerate shapes: dup-heavy corpora,
  *     single-token docs, empty-ish docs);
  *   - the relational count-min sketch never undercounts.
  * Raw ScalaCheck Gens from fixed seeds (same offline-classpath
  * rationale as [[CompilerPropertySpec]]; failures reproduce
  * exactly). */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  // small vocab forces shared grams; varied lengths hit the prefix
  // length formula's edge cases (sz < n, sz == 1, long docs)
  private val docGen: Gen[String] = for {
    len <- Gen.frequency(1 -> Gen.const(0), 2 -> Gen.choose(1, 3),
      5 -> Gen.choose(4, 24))
    toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
  } yield toks.mkString(" ")

  private val corpusGen: Gen[List[String]] =
    Gen.choose(6, 18).flatMap(k => Gen.listOfN(k, docGen))

  test("prefix-filtered jaccard == all-pairs on random corpora") {
    for (seed <- 1L to 4L) {
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val g = Dedup.shingles(docs, $"doc_id", $"text", 2)
      val dfreq = g.groupBy($"gram").agg(count(lit(1)).as("dfr"))
      for (t <- Seq(0.25, 0.5, 0.75)) {
        val fast = Dedup.jaccardPrefixFiltered(g, dfreq, t)
          .as[(Long, Long, Double)].collect().toSet
        val brute = Dedup.ngramJaccardPairsBrute(docs, $"doc_id", $"text",
            n = 2, threshold = t)
          .as[(Long, Long, Double)].collect().toSet
        assert(fast == brute,
          s"seed $seed threshold $t: ${fast.size} vs ${brute.size}")
      }
    }
  }

  test("adaptive jaccard entry point survives an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(empty, $"doc_id", $"text").count() == 0)
    // and a corpus where no doc reaches n tokens (zero shingles)
    val tiny = Seq((1L, "a"), (2L, "b c")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(tiny, $"doc_id", $"text",
      n = 3).count() == 0)
  }

  test("count-min sketch never undercounts on random key multisets") {
    val keyGen = Gen.listOfN(400, Gen.choose(0L, 60L))
    for (seed <- 1L to 3L) {
      val keys = sample(keyGen, seed)
      val dir = s"/tmp/graft_cms_prop_$seed"
      keys.map(k => (k, 0L, "x", 0.0, "", java.sql.Timestamp.valueOf(
          "2024-01-01 00:00:00")))
        .toDF("user_id", "event_id", "event_type", "value", "props", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.queries.AnalyticsQueries.cmsPointEstimates(spark, dir)
        .select($"user_id", $"true_n", $"cms_est").as[(Long, Long, Long)]
        .collect()
      val truth = keys.groupBy(identity).map { case (k, v) =>
        k -> v.size.toLong }
      assert(got.length == truth.size)
      got.foreach { case (k, t, e) =>
        assert(t == truth(k) && e >= t, s"seed $seed key $k")
      }
    }
  }
}
