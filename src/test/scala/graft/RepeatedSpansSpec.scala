package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Property tests for [[Dedup.repeatedSpans]] on synthetic corpora
  * with PLANTED repeats, where the exact maximal span is known by
  * construction. Uses distinct single-char alphabets per doc region so
  * no gram repeats by accident. */
class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private val L = 8 // small gram for fixture-sized docs

  private def spans(docs: Seq[(Long, String)]) =
    Dedup.repeatedSpans(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text"), gramChars = L, minFreq = 2)
      .as[(Long, Long, Long, Long)].collect().toSet

  // unique filler: no char appears twice anywhere across the corpus
  private def filler(from: Char, n: Int): String =
    (0 until n).map(i => (from + i).toChar).mkString

  test("cross-doc planted passage is recovered with exact offsets") {
    val passage = "0123456789abcdef" // 16 chars, repeated across docs
    val d1 = filler('A', 10) + passage + filler('a', 10) // span 11..26
    val d2 = passage + filler('Ѐ', 20)              // span 1..16
    val got = spans(Seq((1L, d1), (2L, d2)))
    // 16-char passage, L=8 => 9 duplicated gram starts per occurrence
    assert(got == Set((1L, 11L, 26L, 9L), (2L, 1L, 16L, 9L)))
  }

  test("all-unique corpus yields no spans") {
    val got = spans(Seq((1L, filler('A', 40)), (2L, filler('က', 40))))
    assert(got.isEmpty)
  }

  test("within-doc repeat is detected (frequency counts same-doc hits)") {
    val rep = "qrstuvwx" // exactly L chars
    val d = rep + filler('A', 12) + rep // spans 1..8 and 21..28
    val got = spans(Seq((1L, d)))
    assert(got == Set((1L, 1L, 8L, 1L), (1L, 21L, 28L, 1L)))
  }

  test("adjacent duplicated regions stitch into one maximal span") {
    // two repeated passages back-to-back: every gram across the join
    // point is also duplicated, so the island must be ONE span
    val p1 = "0123456789abcdef"
    val p2 = "ghijklmnopqrstuv"
    val d1 = p1 + p2 + filler('A', 10)
    val d2 = p1 + p2 + filler('Ѐ', 10)
    val got = spans(Seq((1L, d1), (2L, d2)))
    // 32-char contiguous repeat, L=8 => 25 duplicated starts
    assert(got == Set((1L, 1L, 32L, 25L), (2L, 1L, 32L, 25L)))
  }

  test("docs shorter than the gram length are ignored") {
    val got = spans(Seq((1L, "short"), (2L, "short")))
    assert(got.isEmpty)
  }

  test("coverage filter drops a mostly-duplicated doc, keeps clean ones") {
    val passage = "0123456789abcdefghij" // 20 chars
    val clean = filler('Ѐ', 40)
    val docs = Seq(
      (1L, passage + filler('A', 4)),  // 20/24 dup => drop at 0.5
      (2L, passage + clean),           // 20/60 dup => keep
      (3L, filler('က', 40)))           // unique => coverage 0, keep
    val got = Dedup.repeatedSpanCoverage(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), gramChars = L, minFreq = 2,
        maxCoverage = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got(1L) == ((20L, 20.0 / 24.0, false)))
    assert(got(2L) == ((20L, 20.0 / 60.0, true)))
    assert(got(3L) == ((0L, 0.0, true)))
  }

  test("spliceRepeatedSpans cuts planted passages exactly: middle " +
      "span, leading span, untouched doc, fully-covered doc") {
    val passage = "0123456789abcdef" // 16 chars, repeated across docs
    val head1 = filler('A', 10)
    val tail1 = filler('a', 10)
    val tail2 = filler('Ѐ', 20)
    val docs = Seq(
      (1L, head1 + passage + tail1), // middle span -> head+tail remain
      (2L, passage + tail2),         // leading span -> tail remains
      (3L, filler('か', 30)),        // no repeats -> unchanged
      (4L, passage))                 // fully covered -> ""
    val got = Dedup.spliceRepeatedSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), gramChars = L, minFreq = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 16L, head1 + tail1)))
    assert(got(2L) == ((1L, 16L, tail2)))
    assert(got(3L) == ((0L, 0L, filler('か', 30))))
    assert(got(4L) == ((1L, 16L, "")))
  }

  test("splice invariant on the real corpus: clean length = original " +
      "- removed, and clean text contains no span content (sf0.001)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = Dedup.spliceRepeatedSpans(docs, col("doc_id"),
      col("text"), gramChars = 40, minFreq = 2)
    val bad = out.join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("olen")), "doc_id")
      .filter(length(col("clean_text")).cast("long") =!=
        col("olen") - col("removed_chars"))
      .count()
    assert(bad == 0)
    assert(out.filter(col("n_spans") > 0).count() > 0) // non-vacuous
  }
}
