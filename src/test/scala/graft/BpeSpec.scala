package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** [[graft.ext.Corpus.bpeEncodeWord]]/[[graft.ext.Corpus
  * .bpeEncodeDocs]] — the fold-chain encoder must match an
  * INDEPENDENT reference implementation (canonical best-rank-first,
  * one leftmost occurrence per step) on real corpus words, handle
  * overlapping doubled-symbol merges, and feed packing with exact
  * counts. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical BPE encode: repeatedly merge the LEFTMOST occurrence
    * of the best-ranked pair present — the classic priority-queue
    * algorithm, structurally different from the operator's
    * rank-ordered exhaustive passes. */
  private def refBpe(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = syms.isEmpty
    while (!done) {
      val pairs = syms.indices.dropRight(1).map(i => (syms(i), syms(i + 1)))
      pairs.filter(rank.contains).sortBy(rank).headOption match {
        case None => done = true
        case Some(p) =>
          val i = pairs.indexOf(p)
          syms = (syms.take(i) :+ (p._1 + p._2)) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  test("fold-chain encoder equals the canonical reference on every " +
      "distinct corpus word (sf0.001)") {
    val words = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(filter(split(col("text"), " "), t => t =!= ""))
        .as("word"))
      .distinct()
    val got = words
      .select(col("word"),
        Corpus.bpeEncodeWord(col("word"), Corpus.DefaultBpeMerges)
          .as("syms"))
      .as[(String, Seq[String])].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, syms) =>
      assert(syms == refBpe(w, Corpus.DefaultBpeMerges), s"word '$w'")
    }
  }

  test("doubled-symbol merge handles overlapping occurrences " +
      "leftmost-first (the case the SQL-simultaneous form excludes)") {
    val merges = Seq(("a", "a"), ("aa", "b"))
    val out = Seq(Tuple1("aaa"), Tuple1("aaaa"), Tuple1("aab"),
        Tuple1("baaab")).toDF("w")
      .select(col("w"), Corpus.bpeEncodeWord(col("w"), merges).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("aaa") == Seq("aa", "a"))
    assert(out("aaaa") == Seq("aa", "aa"))
    assert(out("aab") == Seq("aab"))
    // b | aa | a | b — (aa,b) never becomes adjacent after the
    // leftmost-first (a,a) pass
    assert(out("baaab") == Seq("b", "aa", "a", "b"))
    // the reference agrees
    for (w <- out.keys) assert(out(w) == refBpe(w, merges), s"'$w'")
  }

  test("bpeEncodeDocs flattens in document order and counts " +
      "whitespace tokens") {
    val docs = Seq((1L, "the master and"), (2L, "  stop  "))
      .toDF("doc_id", "text")
    val got = Corpus.bpeEncodeDocs(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Seq[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((3L, Seq("the", "m", "a", "st", "er", "and"))))
    assert(got(2L) == ((1L, Seq("st", "o", "p"))))
  }

  test("packSequencesBpe: n_tokens is the real BPE count and layout " +
      "algebra matches packSequences'") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val packed = Corpus.packSequencesBpe(docs, col("doc_id"),
      col("text"), budget = 256, nShards = 4)
    val counts = Corpus.bpeEncodeDocs(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), size(col("bpe")).cast("long").as("n_bpe"))
    // every packed row carries its doc's exact BPE count
    assert(packed.join(counts, "doc_id")
      .filter(col("n_tokens") =!= col("n_bpe")).count() == 0)
    // offsets are exclusive prefix sums within each shard
    val bad = packed
      .withColumn("expect", coalesce(sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(md5(col("doc_id").cast("string")).asc,
            col("doc_id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .filter(col("offset") =!= col("expect")).count()
    assert(bad == 0)
  }

  // --------------------------------------------------- bpeTrainState

  test("bpeTrain learns the hand-computed merge sequence on a fixture " +
      "corpus (weighted counts, lexicographic ties)") {
    val docs = Seq("the the cat", "the hat").toDF("text")
    val merges = Corpus.bpeTrain(docs, col("text"), rounds = 3)
      .select("round", "lhs", "rhs", "merged", "n")
      .as[(Long, String, String, String, Long)]
      .collect().sortBy(_._1).toSeq
    // r1: (h,e)=3 ties (t,h)=3, lex 'h'<'t' -> he
    // r2: the->[t,he]: (t,he)=3 beats (a,t)=2 -> the
    // r3: (a,t)=2 -> at
    assert(merges == Seq(
      (1L, "h", "e", "he", 3L),
      (2L, "t", "he", "the", 3L),
      (3L, "a", "t", "at", 2L)))
  }

  test("trained vocab IS the encoder: joining tokens against it " +
      "yields the learned encoding") {
    val docs = Seq("the the cat", "the hat").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val (_, vocab) = Corpus.bpeTrainState(docs, col("text"), rounds = 3)
    // round-trip: trained syms concatenate back to the word
    val broken = vocab
      .filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(broken == 0)
    val toked = docs.select(col("doc_id"),
      filter(split(col("text"), " "), t => t =!= "").as("toks"))
    val enc = Corpus.bpeEncodeDocsWithVocab(toked, vocab)
      .select(col("n_ws"), concat_ws(" ", col("bpe")).as("s"))
      .as[(Long, String)].collect().toSet
    assert(enc == Set(
      (3L, "the the c at"),   // the->[the], cat->[c,at]
      (2L, "the h at")))      // hat->[h,at]
  }

  test("training exhausts cleanly when no distinct-symbol pair is left") {
    val docs = Seq("aa bb").toDF("text") // only doubled-symbol pairs
    val merges = Corpus.bpeTrain(docs, col("text"), rounds = 5)
    assert(merges.count() == 0)
  }

  test("learned-table encode on real corpus words round-trips and " +
      "never lengthens (sf0.001, 4 rounds)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (merges, vocab) = Corpus.bpeTrainState(docs, col("text"),
      rounds = 4)
    assert(merges.count() == 4)
    val rows = vocab
      .select(col("word"), concat_ws("", col("syms")).as("rt"),
        size(col("syms")).as("n"), length(col("word")).as("l"))
    assert(rows.filter(col("rt") =!= col("word")).count() == 0)
    assert(rows.filter(col("n") > col("l")).count() == 0)
    // at least one real compression happened in 4 rounds
    assert(rows.filter(col("n") < col("l")).count() > 0)
  }
}
