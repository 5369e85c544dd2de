package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.Corpus

/** Invariants for the round-10 block-dedup / skyline operators on
  * synthetic and random inputs (the gates cover the fixed testdata
  * shape; these cover the degenerate shapes).
  *
  *  - [[Corpus.paragraphDedup]]: every distinct block survives
  *    exactly once corpus-wide, the keeper is the (doc_id, idx)-first
  *    occurrence, and a doc of pure repeats reassembles to ''.
  *  - [[Corpus.paretoFrontier]]: the window decomposition selects
  *    exactly the naive quadratic dominance frontier on random point
  *    sets (fixed seeds — offline classpath, reproducible failures).
  */
class ParagraphParetoSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  test("paragraphDedup keeps first occurrence, drops repeats") {
    // block size 2: doc 0 = [A B], doc 1 = [B C], doc 2 = [A]
    val docs = Seq(
      (0L, "a1 a2 b1 b2"),
      (1L, "b1 b2 c1 c2"),
      (2L, "a1 a2")).toDF("doc_id", "text")
    val out = Corpus.paragraphDedup(docs, $"doc_id", $"text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 2L, "a1 a2 b1 b2"), // first occurrence of A and B
      (1L, 2L, 1L, "c1 c2"), // B dropped (doc 0 keeps it)
      (2L, 1L, 0L, ""))) // A dropped entirely
  }

  test("paragraphDedup partial tail block is its own unit") {
    val docs = Seq((7L, "x y z")).toDF("doc_id", "text")
    val out = Corpus.paragraphDedup(docs, $"doc_id", $"text", 2)
      .as[(Long, Long, Long, String)].collect().toSeq
    // blocks: [x y], [z] — both unique, doc reassembles unchanged
    assert(out === Seq((7L, 2L, 2L, "x y z")))
  }

  test("paragraphDedup: distinct blocks survive exactly once (random)") {
    val docGen = for {
      len <- Gen.choose(1, 9)
      toks <- Gen.listOfN(len, Gen.oneOf("p", "q", "r"))
    } yield toks.mkString(" ")
    for (seed <- 1L to 3L) {
      val texts = sample(Gen.listOfN(8, docGen), seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Corpus.paragraphDedup(docs, $"doc_id", $"text", 2)
        .as[(Long, Long, Long, String)].collect()
      // reconstruct all kept blocks; they must be the distinct set of
      // all input blocks (each survives exactly once corpus-wide)
      def blocks(t: String): Seq[String] =
        if (t.isEmpty) Seq.empty
        else t.split(" ").grouped(2).map(_.mkString(" ")).toSeq
      val keptAll = out.toSeq.flatMap(r => blocks(r._4))
      val inputAll = texts.flatMap(blocks)
      assert(keptAll.sorted === inputAll.distinct.sorted,
        s"seed $seed: kept multiset != distinct input blocks")
    }
  }

  test("paretoFrontier == naive quadratic dominance (random points)") {
    val ptGen = for {
      x <- Gen.choose(0, 12)
      y <- Gen.choose(0, 12)
    } yield (x.toDouble, y.toLong)
    for (seed <- 1L to 4L) {
      val pts = sample(Gen.listOfN(40, ptGen), seed)
      val df = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
      val fast = Corpus.paretoFrontier(df, $"id", $"x", $"y")
        .as[(Long, Double, Long)].collect().toSet
      val naive = pts.zipWithIndex.collect {
        case ((x, y), i) if !pts.exists { case (qx, qy) =>
          qx <= x && qy <= y && (qx < x || qy < y) } =>
          (i.toLong, x, y)
      }.toSet
      assert(fast === naive, s"seed $seed: frontier mismatch")
    }
  }
}
