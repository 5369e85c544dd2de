package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** [[Corpus.wordpieceVocab]] / [[Corpus.wordpieceEncodeWords]] — the
  * greedy longest-match-first contract on planted vocabularies (the
  * gate corpus has only 31 short words, so the interesting paths —
  * multi-piece splits, longest-wins ties, both [UNK] rules — are
  * pinned here), plus the corpus-trained round-trip invariant. */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("canonical greedy split: unaffable -> un ##aff ##able") {
    val words = Seq(("unaffable", 1L)).toDF("word", "wf")
    val vocab = Seq("un", "##aff", "##able", "u", "##n", "##a",
      "##f", "##b", "##l", "##e").toDF("piece")
    val out = Corpus.wordpieceEncodeWords(words, vocab).collect().head
    assert(out.getAs[String]("pieces") == "un ##aff ##able")
    assert(out.getAs[Long]("n_pieces") == 3L)
  }

  test("longest match wins over shorter prefixes at every cursor") {
    val words = Seq(("abcab", 1L)).toDF("word", "wf")
    // at pos 0 both "ab" and "abc" match -> "abc" must win; at pos 3
    // both "##a" and "##ab" match -> "##ab" must win.
    val vocab = Seq("ab", "abc", "a", "##a", "##ab", "##b", "##c")
      .toDF("piece")
    val out = Corpus.wordpieceEncodeWords(words, vocab).collect().head
    assert(out.getAs[String]("pieces") == "abc ##ab")
  }

  test("[UNK]: unmatched position and over-length words") {
    val words = Seq(("za", 1L), ("a" * 13, 1L), ("aa", 1L))
      .toDF("word", "wf")
    val vocab = Seq("a", "##a").toDF("piece") // no 'z' anywhere
    val got = Corpus.wordpieceEncodeWords(words, vocab)
      .collect().map(r => r.getAs[String]("word") ->
        (r.getAs[String]("pieces"), r.getAs[Long]("n_pieces"))).toMap
    assert(got("za") == ("[UNK]", 1L))       // no initial 'z' piece
    assert(got("a" * 13) == ("[UNK]", 1L))   // > maxChars=12
    assert(got("aa") == ("a ##a", 2L))       // control
  }

  test("vocab: every single-char occurrence form present, counts") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val v = Corpus.wordpieceVocab(docs, $"text", maxPieceLen = 6,
        topMulti = 150)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "ab" wf=2 contributes a(2), ##b(2), ab(2); "b" wf=1 adds b(1)
    assert(v("a") == 2L && v("##b") == 2L && v("b") == 1L)
    assert(v("ab") == 2L)
    assert(!v.contains("##a")) // 'a' never occurs mid-word
  }

  test("drift: a standing-band vocab UNKs genuinely new incoming words") {
    // standing corpus knows only chars {a, b}; the incoming band
    // brings 'zq' — no initial 'z' piece exists, so it must UNK,
    // while shared words still encode.
    val standing = Seq((0L, "aa bb aa aa bb")).toDF("doc_id", "text")
    val vocab = Corpus.wordpieceVocab(standing, $"text")
    val words = Seq(("aa", 2L), ("zq", 2L)).toDF("word", "wf")
    val got = Corpus.wordpieceEncodeWords(words, vocab)
      .collect().map(r => r.getAs[String]("word") ->
        r.getAs[String]("pieces")).toMap
    assert(got("zq") == "[UNK]")
    assert(got("aa") != "[UNK]")
  }

  test("corpus-trained encode round-trips every gate-corpus word") {
    val docs = sf("documents")
    val words = Corpus.tokens(docs, $"text")
      .groupBy($"token").agg(count(lit(1)).as("wf"))
      .select($"token".as("word"), $"wf")
    val enc = Corpus.wordpieceEncodeWords(words,
      Corpus.wordpieceVocab(docs, $"text")).cache()
    // corpus-trained vocab has every single-char fallback, so no
    // word within the length cap may UNK, and stripping the "##"
    // continuations must reproduce the word exactly.
    val bad = enc.filter(length($"word") <= 12 &&
      ($"pieces" === "[UNK]" ||
        regexp_replace($"pieces", " ##", "") =!= $"word")).count()
    assert(bad == 0L)
    assert(enc.count() == words.count())
  }
}
