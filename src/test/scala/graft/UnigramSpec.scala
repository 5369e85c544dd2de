package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** [[graft.ext.Corpus.viterbiSegment]] /
  * [[graft.ext.Corpus.unigramTrainState]] — the Viterbi kernel must
  * match an INDEPENDENT brute-force enumeration (all segmentations,
  * argmax by product with the same tie rule) on real corpus words,
  * and the trainer must uphold its invariants: coverage (every char
  * a piece), lossless segmentation (pieces concatenate to the word),
  * and count consistency (piece counts = best-path occurrences
  * weighted by word frequency). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: enumerate every segmentation, score by
    * the SAME left-to-right product tree the DP uses, tie-break
    * lexicographically on piece lengths DESC position by position —
    * which is exactly what per-position (score, longer-last-piece)
    * DP resolution induces. */
  private def refSegment(q: Map[String, Long], maxL: Int,
      word: String): List[String] = {
    def enum(pos: Int, acc: List[String], s: Double)
        : List[(List[String], Double)] =
      if (pos == word.length) List((acc.reverse, s))
      else (1 to math.min(maxL, word.length - pos)).toList.flatMap { l =>
        val p = word.substring(pos, pos + l)
        q.get(p).toList.flatMap(qv =>
          enum(pos + l, p :: acc, s * (qv.toDouble / 1073741824.0)))
      }
    val all = enum(0, Nil, 1.0)
    // max score; among ties the per-position longest-last-piece rule
    // induces: maximize piece lengths lexicographically FROM THE END
    import scala.math.Ordering.Implicits._
    val best = all.map(_._2).max
    all.filter(_._2 == best)
      .maxBy { case (segm, _) => segm.reverse.map(_.length) }._1
  }

  test("viterbi picks the max-product segmentation on a hand case " +
      "with the longest-piece tie-break") {
    // 'abab': pieces ab (q=512M), a, b (q=256M each). Product for
    // [ab,ab] = (0.477)^2 >> char paths -> [ab, ab].
    val q = Map("ab" -> (1L << 29), "a" -> (1L << 28), "b" -> (1L << 28))
    assert(Corpus.viterbiSegment(q, 4, "abab") == List("ab", "ab"))
    // exact tie between [aa] and [a,a]: q(aa)/2^30 == (q(a)/2^30)^2
    // when q(aa)=2^28 and q(a)=2^29 -> longer last piece wins
    val q2 = Map("aa" -> (1L << 28), "a" -> (1L << 29))
    assert(Corpus.viterbiSegment(q2, 4, "aa") == List("aa"))
  }

  test("viterbi equals brute-force enumeration on every distinct " +
      "corpus word under the trained model (sf0.001)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (pieces, vocab) = Corpus.unigramTrainState(docs, col("text"))
    val q = pieces.as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    val words = vocab.as[(String, Long, Seq[String])].collect()
    assert(words.nonEmpty)
    words.foreach { case (w, _, syms) =>
      assert(syms.mkString("") == w, s"lossy segmentation of '$w'")
      assert(syms.toList == refSegment(q, 4, w),
        s"viterbi != brute force on '$w'")
    }
    // coverage: every character of every word is a piece
    val chars = words.flatMap(_._1.toSeq).toSet
    chars.foreach(c => assert(q.contains(c.toString),
      s"char '$c' missing from trained vocab"))
  }

  test("trainer count consistency: piece counts equal best-path " +
      "occurrences weighted by word frequency") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (pieces, vocab) = Corpus.unigramTrainState(docs, col("text"))
    val fromVocab = vocab.as[(String, Long, Seq[String])].collect()
      .flatMap { case (_, wf, syms) => syms.map(_ -> wf) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    pieces.as[(String, Long, Long)].collect().foreach {
      case (p, cnt, _) =>
        assert(fromVocab.getOrElse(p, 0L) == cnt,
          s"piece '$p' count $cnt != recount ${fromVocab.get(p)}")
    }
  }

  test("encode flattens pieces in document order") {
    val docs = Seq((1L, "ab ba ab")).toDF("doc_id", "text")
    val vocab = Seq(("ab", 2L, Seq("a", "b")), ("ba", 1L, Seq("ba")))
      .toDF("word", "wf", "syms")
    val got = Corpus.unigramEncodeDocs(docs, col("doc_id"), col("text"),
      vocab).as[(Long, Long, Seq[String])].collect()
    assert(got.length == 1)
    assert(got(0)._2 == 3L)
    assert(got(0)._3 == Seq("a", "b", "ba", "a", "b"))
  }
}
