package graft

import org.apache.spark.sql.functions._

import graft.ext.Lm
import graft.queries.TrainQueries

/** [[graft.ext.Lm]] + [[graft.queries.TrainQueries]]: hand-computed
  * bigram-LM scores on a toy corpus, apportionment invariants, and
  * non-vacuity of every gate on sf0.001. */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("scoreDocs matches hand-computed add-one bigram algebra") {
    // corpus: "a b a b" and "a c" → bigrams ab, ba, ab, ac
    // c(a,b)=2 c(b,a)=1 c(a,c)=1; c1(a)=3 c1(b)=1; V=3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Lm.scoreDocs(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    val qAb = (2L + 1L) * 1048576L / (3L + 3L) // 524288
    val qBa = (1L + 1L) * 1048576L / (1L + 3L) // 524288
    val qAc = (1L + 1L) * 1048576L / (3L + 3L) // 349525
    assert(out(0).getLong(1) === 3L) // doc 1: ab, ba, ab
    assert(out(0).getLong(2) === qAb + qBa + qAb)
    assert(out(1).getLong(1) === 1L)
    assert(out(1).getLong(2) === qAc)
    assert(out(1).getDouble(3) === qAc.toDouble / 1048576.0)
  }

  test("scoreDocs keeps 0-bigram docs with n=0, q_sum=0, null mean") {
    val docs = Seq((1L, "solo"), (2L, "a a")).toDF("doc_id", "text")
    val r = Lm.scoreDocs(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    assert(r(0).getLong(1) === 0L && r(0).getLong(2) === 0L)
    assert(r(0).isNullAt(3))
    assert(r(1).getLong(1) === 1L)
  }

  test("holdout scoring never consults held-out counts") {
    // even doc trains: "x y"; odd doc scored: "y z" — bigram (y,z)
    // unseen, context y unseen → q = 1·2^20/(0+V), V=2 ({x,y}).
    val docs = Seq((0L, "x y", "en"), (1L, "y z", "en"))
      .toDF("doc_id", "text", "lang")
    val big = Lm.seqBigrams(docs, col("doc_id"), col("text"),
      carry = Seq("lang"))
    val c12 = Lm.bigramCounts(big.filter(col("id") % 2 === 0))
    val scored = Lm.scoreBigrams(big.filter(col("id") % 2 === 1),
      c12, Lm.contextCounts(c12),
      Lm.vocabSize(docs.filter(col("doc_id") % 2 === 0), col("text")))
    val q = scored.select("q").as[Long].collect()
    assert(q.toSeq === Seq(1048576L / 2))
  }

  test("token_budget_alloc sums exactly to the budget") {
    val out = TrainQueries.tokenBudgetAlloc(spark, dir)
    val total = out.agg(sum("alloc")).as[Long].collect()(0)
    assert(total === 100000L)
    assert(out.filter(col("alloc") <= 0).count() === 0)
  }

  test("tv divergence is a [0,1] fraction and covers every source") {
    val out = TrainQueries.tokenTvDivergence(spark, dir)
    val n = Tables(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.count() === n)
    assert(out.filter(col("tv_num") < 0 ||
      col("tv_num") > col("tv_den")).count() === 0)
  }

  test("epoch plan: effective tokens bounded by 1x..4x raw tokens") {
    val out = TrainQueries.epochRepeatPlan(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(col("effective_tokens") < col("n_tokens") ||
      col("effective_tokens") > col("n_tokens") * 4).count() === 0)
  }

  test("cluster_balanced_sample respects the per-cell cap") {
    val out = TrainQueries.clusterBalancedSample(spark, dir)
    val per = out.groupBy("cell_id").count()
    assert(per.filter(col("count") > 24).count() === 0)
    assert(out.count() > 0)
    // sampling never invents ids
    val ids = Tables(spark, dir, "embeddings").select(col("vec_id"))
    assert(out.join(ids, out("nbr_id") === ids("vec_id"), "left_anti")
      .count() === 0)
  }

  test("bitext margin mining: margins >= 1, queries from even side") {
    val out = TrainQueries.bitextMarginMining(spark, dir).collect()
    assert(out.length > 0)
    assert(out.forall(r => r.getDouble(3) >= 1.0))
    assert(out.forall(r => r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1))
  }

  test("quality ensemble: votes in 0..3, multiple levels populated") {
    val out = TrainQueries.qualityEnsembleGate(spark, dir)
    assert(out.filter(col("votes") < 0 || col("votes") > 3).count() === 0)
    assert(out.select("votes").distinct().count() >= 2)
    val total = out.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total === Tables(spark, dir, "documents").count())
  }

  test("stream_lm_score equals the batch per-lang roll-up") {
    import graft.ext.Lm
    val docs = Tables(spark, dir, "documents")
    val big = Lm.seqBigrams(docs, col("doc_id"), col("text"),
      carry = Seq("lang"))
    val c12 = Lm.bigramCounts(big)
    val batch = Lm.scoreBigrams(big, c12, Lm.contextCounts(c12),
        Lm.vocabSize(docs, col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("q_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val stream = graft.queries.PipelineQueries.streamLmScore(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(stream === batch)
  }

  test("releaseDiff classifies exact, near, and new correctly") {
    import graft.ext.Dedup
    // standing: ids 0,1; incoming: 3 (exact copy of 0), 7 (near of 1),
    // 11 (unrelated). incomingPred = id % 4 == 3.
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "p q r s t u v w"),
      (3L, "a b c d e f g h"),          // exact dup of 0
      (7L, "p q r s t u v x"),          // near dup of 1 (J >= 0.5)
      (11L, "z1 z2 z3 z4 z5 z6 z7 z8")) // new
      .toDF("doc_id", "text")
    val out = Dedup.releaseDiff(docs, col("doc_id"), col("text"),
      col("doc_id") % 4 === 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === Map(3L -> "exact", 7L -> "near", 11L -> "new"))
  }

  test("curriculum_by_quality: dense 0-based rank, buckets walked desc") {
    val out = TrainQueries.curriculumByQuality(spark, dir)
      .select("curriculum_pos", "bucket").collect()
      .map(r => (r.getLong(1), r.getLong(0))).sortBy(_._2)
    assert(out.map(_._2).toSeq === out.indices.map(_.toLong))
    // bucket sequence along the curriculum is non-increasing
    assert(out.map(_._1).sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)))
  }

  test("vocab_growth_curve is monotone and ends at the full vocab") {
    val out = TrainQueries.vocabGrowthCurve(spark, dir)
      .orderBy("k").collect()
    val vocab = out.map(_.getLong(2))
    assert(vocab.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    val full = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
      .filter(col("tok") =!= "").distinct().count()
    assert(vocab.last === full)
    assert(out.map(_.getLong(3)).sum === full)
  }

  test("ngram coverage and confusion audits are internally consistent") {
    val cov = TrainQueries.ngramCoverageAudit(spark, dir).collect()
    assert(cov.nonEmpty)
    assert(cov.forall(r => r.getLong(2) <= r.getLong(1) &&
      r.getLong(4) <= r.getLong(3)))
    val conf = TrainQueries.langConfusionAudit(spark, dir)
    assert(conf.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables(spark, dir, "documents").count())
    val codes = Set("en", "de", "es", "fr", "zh", "und")
    assert(conf.select("lang_guess").distinct().collect()
      .forall(r => codes(r.getString(0))))
  }

  test("mergeCounts equals a recount on the union") {
    import graft.ext.Lm
    val a = Seq((10L, "x y x"), (11L, "y x")).toDF("doc_id", "text")
    val b = Seq((12L, "x y")).toDF("doc_id", "text")
    val union = a.unionByName(b)
    val merged = Lm.mergeCounts(
      Lm.bigramCounts(Lm.seqBigrams(a, col("doc_id"), col("text"))),
      Lm.bigramCounts(Lm.seqBigrams(b, col("doc_id"), col("text"))),
      Seq("w1", "w2"), "c12")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2))).toMap
    val full = Lm.bigramCounts(
      Lm.seqBigrams(union, col("doc_id"), col("text")))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2))).toMap
    assert(merged === full)
  }

  test("label propagation covers every doc; isolated seeds keep sign") {
    val out = TrainQueries.qualityLabelPropagation(spark, dir)
    assert(out.count() === Tables(spark, dir, "documents").count())
    // a doc outside the pair graph ends at score = 2*(2*seed) + 0,
    // hence label == sign(seed); propagation only touches paired docs
    assert(out.filter(col("score") === col("seed") * 4 &&
      sign(col("score").cast("double")).cast("long") =!= col("label"))
      .count() === 0)
    // labels populated on both confident sides
    assert(out.filter(col("label") === 1).count() > 0)
    assert(out.filter(col("label") === -1).count() > 0)
  }

  test("survivor bias: survivors are a subset, shares sum to 1") {
    val out = TrainQueries.dedupSurvivorBias(spark, dir)
    assert(out.filter(col("docs_after") > col("docs_before"))
      .count() === 0)
    val sums = out.agg(sum("share_before"), sum("share_after"))
      .collect()(0)
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-9)
  }

  test("collocation lift: floor respected, ranked desc, bounded top-k") {
    val out = TrainQueries.collocationLift(spark, dir).collect()
    assert(out.length <= 20 && out.nonEmpty)
    assert(out.forall(_.getLong(2) >= 5))
    val lifts = out.map(_.getDouble(3))
    assert(lifts.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("feature hash export: one row per active user, labels 0/1") {
    val out = TrainQueries.featureHashExport(spark, dir)
    val users = Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.count() === users)
    assert(out.filter(!col("label").isin(0L, 1L)).count() === 0)
    assert(out.filter(col("features") === "").count() === 0)
  }

  test("ranking RBO: overlap monotone, rbo in (0,1], depth-10 overlap full") {
    val out = TrainQueries.rankingRbo(spark, dir).orderBy("d").collect()
    assert(out.length === 10)
    val ov = out.map(_.getLong(1))
    assert(ov.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(ov.last === 10L) // same 10 candidates in both lists
    val rbo = out.last.getDouble(3)
    assert(rbo > 0.0 && rbo <= 1.0 + 1e-12)
  }

  test("trigram backoff: tiers partition the test grams, q bounded") {
    val out = TrainQueries.lmTrigramBackoff(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 3))
    // every tier-3/2/1 q is at most 2^20 scaled by the backoff weight
    assert(out.forall(r => r.getLong(3) >= 0))
    val total = out.map(_.getLong(2)).sum
    // matches the count of test-side trigram occurrences
    import graft.ext.Lm
    val test = Lm.seqTrigrams(
      Tables(spark, dir, "documents").filter(col("doc_id") % 2 === 1),
      col("doc_id"), col("text")).count()
    assert(total === test)
  }

  test("train-order e2e: positions dense over survivors, buckets 1..4") {
    val out = TrainQueries.corpusTrainOrderE2e(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 4))
    val n = out.map(_.getLong(2)).sum
    assert(out.map(_.getLong(4)).min === 0L)
    assert(out.map(_.getLong(5)).max === n - 1)
  }

  test("sft turn mask: masked <= total, turns partition, fp unique") {
    val out = TrainQueries.sftTurnMask(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(4) <= r.getLong(3)))
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    // rendered fingerprints should be unique across users here
    assert(out.map(_.getString(5)).distinct.length === out.length)
  }

  test("dataset card: one row, rates in [0,1], totals consistent") {
    val r = TrainQueries.datasetCard(spark, dir).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(0) === Tables(spark, dir, "documents").count())
    for (i <- 3 to 5) {
      val v = row.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"col $i = $v")
    }
  }

  test("epoch shuffles: three distinct permutations of the same set") {
    val out = TrainQueries.epochShuffleOrders(spark, dir).collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).distinct.length === 1) // same n
    // different epochs => different order checksums (distinct perms)
    assert(out.map(_.getLong(2)).distinct.length === 3)
  }

  test("curriculum manifest: shards contiguous and full except tail") {
    val out = TrainQueries.curriculumExportManifest(spark, dir)
      .orderBy("shard").collect()
    assert(out.nonEmpty)
    for (r <- out)
      assert(r.getLong(3) - r.getLong(2) + 1 === r.getLong(1))
    assert(out.init.forall(_.getLong(1) === 64L))
  }

  test("quality signal corr: rho in [-1,1], n covers the corpus") {
    val r = TrainQueries.qualitySignalCorr(spark, dir).collect()(0)
    assert(r.getLong(0) === Tables(spark, dir, "documents").count())
    assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
  }

  test("token tail audit: head share in (0,1], head <= total") {
    val out = TrainQueries.tokenTailAudit(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) <= r.getLong(1)))
    assert(out.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
  }

  test("mixture resample: rates bind, samples within corpus bounds") {
    val out = TrainQueries.mixtureResampleToAlloc(spark, dir).collect()
    assert(out.nonEmpty)
    // sampled counts never exceed the language's corpus
    assert(out.forall(r => r.getLong(4) <= r.getLong(1)))
    // budget << corpus, so at least one language must subsample
    assert(out.exists(r => r.getLong(4) < r.getLong(1)))
    assert(out.forall(r => r.getLong(3) >= 0))
  }

  test("gates are non-vacuous on sf0.001") {
    assert(TrainQueries.lmBigramScore(spark, dir)
      .filter(col("n_bigrams") > 0).count() > 0)
    assert(TrainQueries.lmHoldoutPerlang(spark, dir).count() > 0)
    val f = TrainQueries.lmQualityFilter(spark, dir)
      .agg(sum("n_kept"), sum("n_dropped")).collect()(0)
    assert(f.getLong(0) > 0 && f.getLong(1) > 0)
  }
}
