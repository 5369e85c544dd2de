package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count-based bigram language model — the classic corpus-statistics
  * quality scorer (the KenLM-shaped pass of a training-data pipeline:
  * score every document under a cheap n-gram model and gate on the
  * score; reference has nothing comparable — extended-engine surface).
  *
  * Cross-engine determinism: the usual per-token statistic is
  * `log p(w2|w1)`, but `ln` is not correctly rounded and differs
  * between libm and the JVM in the last ulp (SKILL.md), so no
  * log-domain sum can hash-gate. This model scores in the
  * PROBABILITY domain with integer quantization instead:
  * per bigram occurrence,
  *
  *   q = floor( (c(w1,w2) + 1) · 2²⁰ / (c(w1) + V) )
  *
  * (add-one smoothing) is a pure BIGINT expression — the product is
  * exact (counts · 2²⁰ stays far below 2⁶³ at gate scale; at 10¹²-token
  * scale swap the 2²⁰ for 2¹⁰ or widen to DECIMAL), the floor-div is
  * exact on both engines (`div` / `//`), and per-doc Σq is an integer
  * sum — order-independent, hash-gateable. The readout
  * `mean_p = Σq / (n·2²⁰)` is ONE double divide on identical operands,
  * so it is bit-identical cross-engine too.
  *
  * Scale shape: token/bigram extraction is a per-row projection
  * (no shuffle); the model is two hash aggregations on (w1,w2) and
  * (w1); scoring joins the corpus bigram stream against the model on
  * its natural keys — all shuffles are on the join/agg keys, nothing
  * is collected to the driver (the vocabulary size rides as a 1-row
  * crossed aggregate, the house idiom for bounded scalars).
  */
object Lm {

  /** Sequential bigram stream (WITH multiplicity — unlike
    * [[Dedup.shingles]]' distinct gram sets): one row per adjacent
    * token pair per document, plus any carried columns. */
  def seqBigrams(docs: DataFrame, id: Column, text: Column,
      carry: Seq[String] = Nil): DataFrame = {
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val toked = docs
      .select((id.as("id") +: carry.map(col)) :+
        TextFunctions.tokens(text).as("t"): _*)
      .repartition(p)
    val pairs = when(size(col("t")) >= 2,
      transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2"))))
      .otherwise(array())
    toked.select((col("id") +: carry.map(col)) :+
        explode(pairs).as("b"): _*)
      .select((col("id") +: carry.map(col)) :+
        col("b.w1") :+ col("b.w2"): _*)
  }

  /** Bigram transition counts c(w1,w2) from a [[seqBigrams]] frame. */
  def bigramCounts(bigrams: DataFrame): DataFrame =
    bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

  /** Predecessor (unigram-as-context) counts c(w1), rolled up from the
    * bigram counts — no second corpus scan. */
  def contextCounts(c12: DataFrame): DataFrame =
    c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))

  /** 1-row vocabulary-size frame (distinct non-empty tokens). */
  def vocabSize(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .agg(count_distinct(col("tok")).as("v"))

  /** Score a bigram stream under a trained model: add-one-smoothed
    * transition probability quantized to 2⁻²⁰ units (`q` BIGINT).
    * Bigrams/contexts unseen in training coalesce to count 0, so the
    * expression stays total (holdout scoring). */
  def scoreBigrams(bigrams: DataFrame, c12: DataFrame, c1: DataFrame,
      v: DataFrame): DataFrame =
    bigrams
      .join(c12, Seq("w1", "w2"), "left_outer")
      .join(c1, Seq("w1"), "left_outer")
      .crossJoin(broadcast(v))
      .withColumn("q", expr(
        "((coalesce(c12, 0L) + 1L) * 1048576L) div (coalesce(c1, 0L) + v)"))

  /** Sequential trigram stream (WITH multiplicity): one row per
    * adjacent token triple per document, plus carried columns. */
  def seqTrigrams(docs: DataFrame, id: Column, text: Column,
      carry: Seq[String] = Nil): DataFrame = {
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val toked = docs
      .select((id.as("id") +: carry.map(col)) :+
        TextFunctions.tokens(text).as("t"): _*)
      .repartition(p)
    val triples = when(size(col("t")) >= 3,
      transform(sequence(lit(1), size(col("t")) - 2),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2"),
          element_at(col("t"), i + 2).as("w3"))))
      .otherwise(array())
    toked.select((col("id") +: carry.map(col)) :+
        explode(triples).as("g"): _*)
      .select((col("id") +: carry.map(col)) :+
        col("g.w1") :+ col("g.w2") :+ col("g.w3"): _*)
  }

  /** Merge a delta batch's counts into a persisted count frame: count
    * frames are mergeable monoids (rows add by key), so absorbing a
    * batch is one union + re-aggregate over the STORED ROWS + delta —
    * the standing corpus is never re-tokenized, and by associativity
    * of counting the merged model is bit-equal to a full retrain on
    * the union (the property the `lm_incremental_update` gate pins:
    * its oracle retrains from scratch). Works for any (keys..., count)
    * frame — bigram counts and token counts alike. */
  def mergeCounts(stored: DataFrame, delta: DataFrame,
      keys: Seq[String], cnt: String): DataFrame =
    stored.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(cnt)).as(cnt))

  /** Token-occurrence counts (the vocabulary frame — its row count is
    * V; mergeable with [[mergeCounts]]). */
  def tokenCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): select raw
    * documents whose HASHED-N-GRAM feature distribution matches a
    * target domain. Features are hashed bigrams (md5-derived 32-bit
    * hash mod `numBuckets` — the oracle-reproducible hash32 idiom);
    * the target and raw unigram-over-buckets models use the same
    * add-one quantized probabilities as the bigram scorer
    * (q = (c+1)·2²⁰ div (n+B), pure BIGINT), and the per-document
    * importance weight is the RATIO OF QUANTIZED SUMS
    * num/den = Σ q_target(f) / Σ q_raw(f) over the doc's feature
    * occurrences — the float-free surrogate of the paper's
    * log-likelihood ratio (log-domain sums can't hash-gate; SKILL's
    * `ln` seam), monotone in the same direction: docs whose features
    * are relatively more probable under the target up-weight.
    *
    * Returns (id, n_features, num, den). Feature-less documents
    * (under 2 tokens) don't appear — samplers treat them as
    * weight-0. Scale shape: one bigram projection (no shuffle), one
    * B-row model aggregate with a 1-row total, one join back on the
    * bucket key; counts stay below 2⁴³ for the 2²⁰ quantizer —
    * widen to DECIMAL past that (the [[Lm]] scaladoc note). */
  def dsirWeights(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, numBuckets: Int = 512): DataFrame = {
    require(numBuckets >= 2 && numBuckets <= (1 << 20), "buckets sane")
    val big = graft.Tables.materialize(
      seqBigrams(docs.withColumn("_tgt", isTarget), id, text,
          carry = Seq("_tgt"))
        .withColumn("f",
          TextFunctions.hash32(concat_ws("|", col("w1"), col("w2")))
            % numBuckets))
    val counts = big.groupBy(col("f"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum(col("cr")).as("nr"),
      sum(col("ct")).as("nt"))
    val q = counts.crossJoin(broadcast(totals))
      .select(col("f"),
        expr(s"((ct + 1L) * 1048576L) div (nt + $numBuckets)").as("qt"),
        expr(s"((cr + 1L) * 1048576L) div (nr + $numBuckets)").as("qr"))
    big.join(q, "f")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_features"),
        sum(col("qt")).as("num"), sum(col("qr")).as("den"))
  }

  /** The DSIR keep decision for a (num, den) weight row:
    * keep ⟺ hash32(key) · den < num · 2³² — [[Corpus.weightedSample]]'s
    * deterministic hash-threshold rule with the RATIONAL weight
    * num/den (min(1, ·) implicit: num ≥ den keeps always), evaluated
    * in DECIMAL(18,0)·DECIMAL(18,0) products so no float and no
    * overflow at any plausible operand size (each side ≤ 10³⁶). */
  def dsirKeep(key: Column, num: Column, den: Column): Column =
    TextFunctions.hash32(key.cast("string")).cast("decimal(18,0)") *
      den.cast("decimal(18,0)") <
      num.cast("decimal(18,0)") *
        lit(4294967296L).cast("decimal(18,0)")

  /** Per-document score: bigram count and Σq over the doc's sequential
    * bigrams. Every input doc appears (0-bigram docs carry n=0,
    * q_sum=0, mean_p NULL). */
  def scoreDocs(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // the bigram explosion feeds BOTH the model aggregation and the
    // scoring join — materialize so it runs once (house rule: eager
    // fill, lazy caches under one job serialize on block locks)
    val big = graft.Tables.materialize(seqBigrams(docs, id, text))
    val c12 = bigramCounts(big)
    val scored = scoreBigrams(big, c12, contextCounts(c12),
      vocabSize(docs, text))
    val per = scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("q_sum"))
    docs.select(id.as("id")).join(per, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("q_sum"), lit(0L)).as("q_sum"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          col("q_sum").cast("double") /
            (col("n_bigrams") * lit(1048576L)).cast("double"))
          .as("mean_p"))
  }
}
