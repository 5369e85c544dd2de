package graft

import org.apache.spark.sql.functions._

import graft.ext.{Corpus, Dedup, Similarity}

/** Specs for the wave-5 operators: winnowing fingerprints, curriculum
  * ordering, sorted-neighborhood linkage, and the dimension-variance
  * audit. */
class WinnowCurriculumSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------- winnowFingerprints

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // k=3, w=4: any shared run of >= 6 tokens must yield a common
    // (hash) fingerprint in both docs
    val shared = "one two three four five six"
    val df = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta"),
      (2L, s"$shared completely different suffix tokens here"))
      .toDF("id", "text")
    val fp = Dedup.winnowFingerprints(df, col("id"), col("text"))
    val h1 = fp.filter(col("doc_id") === 1).select("fp_hash")
      .as[Long].collect().toSet
    val h2 = fp.filter(col("doc_id") === 2).select("fp_hash")
      .as[Long].collect().toSet
    assert((h1 & h2).nonEmpty)
  }

  test("winnowing density and bounds: one fingerprint per window at most") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val fp = Dedup.winnowFingerprints(df, col("id"), col("text"),
      k = 3, w = 4)
    val rows = fp.select("fp_pos").as[Long].collect()
    // 38 grams, 35 full windows; distinct selections bounded by both
    assert(rows.nonEmpty && rows.length <= 35)
    assert(rows.forall(p => p >= 1 && p <= 38))
    // consecutive selected positions never more than w apart (the
    // winnowing coverage property)
    val sortedP = rows.sorted
    sortedP.sliding(2).foreach {
      case Array(a, b) => assert(b - a <= 4)
      case _ =>
    }
  }

  test("winnowing: short docs emit nothing, determinism holds") {
    val df = Seq((1L, "too few tokens here"), (2L, "a b"))
      .toDF("id", "text")
    // 4 tokens => 2 grams < w+... no full 4-gram window => empty
    val fp = Dedup.winnowFingerprints(df, col("id"), col("text"))
    assert(fp.count() == 0)
    val big = Seq((9L, (1 to 30).map("w" + _).mkString(" ")))
      .toDF("id", "text")
    val a = Dedup.winnowFingerprints(big, col("id"), col("text"))
      .collect().toSet
    val b = Dedup.winnowFingerprints(big, col("id"), col("text"))
      .collect().toSet
    assert(a == b)
  }

  // ------------------------------------------------------ winnowPairs

  test("winnowPairs finds a planted partial overlap and caps hot fingerprints") {
    val para = (1 to 12).map(i => s"copied$i").mkString(" ")
    val docs = Seq(
      (1L, s"unique one text body alpha beta $para gamma delta end"),
      (2L, s"$para totally different following content words here"),
      (3L, "nothing in common with the others at all whatsoever okay"))
      .toDF("id", "text")
    val pairs = Dedup.winnowPairs(docs, col("id"), col("text"),
      minShared = 1)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
    // hot-fingerprint cap: 20 docs sharing the same text emit zero
    // pairs at maxDf = 8 (every shared fingerprint exceeds the cap)
    val hot = (1 to 20).map(i => (i.toLong,
      "the same boilerplate footer text repeated verbatim everywhere"))
      .toDF("id", "text")
    assert(Dedup.winnowPairs(hot, col("id"), col("text"),
      maxDf = 8, minShared = 1).count() == 0)
  }

  // ------------------------------------------------- curriculumOrder

  test("curriculumOrder: buckets are quartile-monotone and positions are a permutation") {
    val docs = spark.range(100)
      .select(col("id"),
        concat_ws(" ", transform(sequence(lit(1),
          (col("id") % 20 + 1).cast("int")), i => concat(lit("w"), i)))
          .as("text"))
    val out = Corpus.curriculumOrder(docs, col("id"), col("text"))
    val rows = out.select("n_tokens", "bucket", "curriculum_pos")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 100)
    // positions are exactly 0..99
    assert(rows.map(_._3).sorted.toSeq == (0L until 100L))
    // bucket is monotone in position (easy->hard walk)
    val byPos = rows.sortBy(_._3)
    byPos.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
    // bucket is monotone in n_tokens
    val maxPerBucket = rows.groupBy(_._2).view
      .mapValues(_.map(_._1).max).toMap
    val minPerBucket = rows.groupBy(_._2).view
      .mapValues(_.map(_._1).min).toMap
    for (b <- 1L to 3L if maxPerBucket.contains(b)
         && minPerBucket.contains(b + 1))
      assert(maxPerBucket(b) <= minPerBucket(b + 1))
  }

  // --------------------------------------------- sortedNeighborPairs

  test("sortedNeighborPairs: only rank-adjacent pairs, all within maxDist") {
    val docs = Seq(
      (1L, "apple pie recipe with extra sugar"),
      (2L, "apple pie recipf with extra sugar"), // 1 edit from doc 1
      (3L, "zebra crossing in the city"),
      (4L, "banana bread with nuts"))
      .toDF("id", "text")
    val pairs = Corpus.sortedNeighborPairs(docs, col("id"),
      lower(substring(col("text"), 1, 16)), col("text"),
      prefixLen = 24, w = 3, maxDist = 8)
    val got = pairs.select("id_a", "id_b", "dist")
      .as[(Long, Long, Long)].collect()
    // the planted near-pair is found
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1L))
    assert(got.forall(_._3 <= 8))
  }

  test("sortedNeighborPairs candidate budget: <= w*n pairs even with identical keys") {
    // 50 identical sort keys — hard blocking would go quadratic
    // (50*49/2 = 1225 candidates); SNM stays at <= w*n = 150
    val docs = (1 to 50).map(i => (i.toLong, s"same same same unique$i"))
      .toDF("id", "text")
    val pairs = Corpus.sortedNeighborPairs(docs, col("id"),
      lower(substring(col("text"), 1, 14)), col("text"),
      prefixLen = 24, w = 3, maxDist = 100)
    assert(pairs.count() <= 3L * 50)
  }

  // --------------------------------------- winnowing guarantee (random)

  test("winnowing guarantee holds on random corpora (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error(s"gen failed for seed $seed"))
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val toksGen = (n: Int) => Gen.listOfN(n, Gen.oneOf(vocab))
    // k=3, w=4: any shared run of >= 6 tokens guarantees a shared
    // fingerprint hash — plant a random 6..10-token run inside two
    // random docs at random offsets, check the intersection
    val caseGen = for {
      run <- Gen.choose(6, 10).flatMap(toksGen)
      pre1 <- Gen.choose(0, 12).flatMap(toksGen)
      suf1 <- Gen.choose(0, 12).flatMap(toksGen)
      pre2 <- Gen.choose(0, 12).flatMap(toksGen)
      suf2 <- Gen.choose(0, 12).flatMap(toksGen)
    } yield ((pre1 ++ run ++ suf1).mkString(" "),
      (pre2 ++ run ++ suf2).mkString(" "))
    // batch all seeds into ONE DataFrame: doc ids 2s / 2s+1 pair up
    val cases = (1L to 24L).map(s => sample(caseGen, s))
    val docs = cases.zipWithIndex.flatMap { case ((d1, d2), i) =>
      Seq((2L * i, d1), (2L * i + 1, d2))
    }.toDF("id", "text")
    val fp = graft.ext.Dedup
      .winnowFingerprints(docs, col("id"), col("text"))
      .select(col("doc_id"), col("fp_hash"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    cases.indices.foreach { i =>
      val (a, b) = (fp.getOrElse(2L * i, Set.empty[Long]),
        fp.getOrElse(2L * i + 1, Set.empty[Long]))
      assert((a & b).nonEmpty, s"case $i: no shared fingerprint")
    }
  }

  // ------------------------------- streaming gates are not vacuous

  test("stream_late_data actually drops stragglers; outer join actually null-emits") {
    val dir = "/root/testdata/sf0.001"
    val nEvents = sf("events").count()
    val lateTotal = graft.queries.PipelineQueries
      .streamLateData(spark, dir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(lateTotal < nEvents, "no late rows were dropped")
    assert(lateTotal > nEvents / 2, "dropped far too much")
    val outer = graft.queries.PipelineQueries
      .streamOuterJoin(spark, dir)
    assert(outer.filter(col("click_id").isNull).count() > 0,
      "no null-padded outer rows emitted")
    assert(outer.filter(col("click_id").isNotNull).count() > 0,
      "no inner matches emitted")
  }

  // ------------------------------------------------ covarianceMatrix

  test("covariance diagonal equals the dim-variance audit bit for bit") {
    val emb = sf("embeddings")
    val diag = graft.ext.Similarity
      .covarianceMatrix(emb, col("vec_id"), col("embedding"))
      .filter(col("i") === col("j"))
      .select(col("i"), col("cov"))
      .as[(Long, Double)].collect().toMap
    val vars = graft.ext.Similarity
      .dimVarianceAudit(emb, col("embedding"))
      .select(col("i"), col("variance"))
      .as[(Long, Double)].collect().toMap
    assert(diag.keySet == vars.keySet && diag.nonEmpty)
    diag.foreach { case (i, c) => assert(c == vars(i), s"dim $i") }
  }

  // ------------------------------------------------- tClosenessAudit

  test("tClosenessAudit: skewed classes far, proportional class at zero") {
    // bands {0,1}: A all-band0, B all-band1, C mirrors the global mix
    // exactly. Global = (20,20)/40; A's EMD = |10/10 - 20/40| = 0.5,
    // C's = 0 by proportionality.
    val rows =
      (1 to 10).map(_ => ("A", 0L)) ++
        (1 to 10).map(_ => ("B", 1L)) ++
        (1 to 10).flatMap(_ => Seq(("C", 0L), ("C", 1L)))
    val df = rows.toDF("grp", "band")
    val out = graft.ext.Privacy.tClosenessAudit(df, Seq(col("grp")),
        col("band"), t = 0.2)
      .select(col("_q0"), col("emd"), col("t_close"))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("C")._2 === 0.0)
    assert(out("C")._3)
    assert(math.abs(out("A")._2 - 0.5) < 1e-12)
    assert(math.abs(out("B")._2 - 0.5) < 1e-12)
    assert(!out("A")._3 && !out("B")._3)
  }

  // -------------------------------------------------- shardRebalance

  test("consistent ring: every moved key lands on the NEW shard") {
    // adding shard n leaves old vnode positions untouched, so a key
    // can only move by being claimed by one of the new shard's vnodes
    val keys = spark.range(2000).toDF("id")
    val h = graft.functions.TextFunctions.hash32(col("id").cast("string"))
    val moved = keys.select(
        Corpus.ringAssign(h, Corpus.consistentRing(8, 16)).as("s8"),
        Corpus.ringAssign(h, Corpus.consistentRing(9, 16)).as("s9"))
      .filter(col("s8") =!= col("s9"))
    assert(moved.count() > 0)
    assert(moved.filter(col("s9") =!= 8L).count() == 0)
  }

  test("native ring_assign equals the HOF formulation and runs codegen'd") {
    val ring = Corpus.consistentRing(8, 16)
    val pos = lit(ring.map(_._1).toArray)
    val shards = lit(ring.map(_._2.toLong).toArray)
    val hof = element_at(shards,
      (pmod(size(filter(pos, p => p < col("h"))), lit(ring.size)) + 1)
        .cast("int"))
    val df = sf("documents").select(
      graft.functions.TextFunctions.hash32(col("doc_id").cast("string"))
        .as("h"))
    val cmp = df.select(
      Corpus.ringAssign(col("h"), ring).as("native"), hof.as("ref"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
    val plan = df.select(Corpus.ringAssign(col("h"), ring).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [ring_assign"), plan)
  }

  test("ringAssign wraps past the last vnode to the ring head") {
    val ring = Seq((100L, 1), (200L, 0), (300L, 2))
    val df = Seq(50L, 150L, 250L, 350L).toDF("h")
    val got = df.select(col("h"),
        Corpus.ringAssign(col("h"), ring).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(got(50L) == 1L)   // first pos >= 50 is 100 -> shard 1
    assert(got(150L) == 0L)  // 200 -> shard 0
    assert(got(250L) == 2L)  // 300 -> shard 2
    assert(got(350L) == 1L)  // wraps to head -> shard 1
  }

  test("longestSharedRuns: planted 7-token run measured exactly, " +
      "disjoint pair drops out, repeats don't inflate the run") {
    import graft.ext.Dedup
    val docs = Seq(
      (1L, "x1 x2 a b c d e f g y1 y2"),
      (2L, "z1 a b c d e f g z2 z3 z4"), // shares the 7-token run a..g
      (3L, "p q r s t u v w"),           // disjoint from doc 1
      (4L, "a b a b a b"),               // repeats, max aligned run 4
      (5L, "a b a b q q"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val runs = Dedup.longestSharedRuns(pairs, docs,
        col("doc_id"), col("text"))
      .as[(Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(runs((1L, 2L)) == 7L)
    assert(!runs.contains((1L, 3L))) // zero shared tokens -> no row
    assert(runs((4L, 5L)) == 4L)     // "a b a b" aligned at offset 0
  }

  test("winnow_verify_exact gate: verified == (lcs_run >= w+k-1) and " +
      "every winnow pair gets an exact run measurement") {
    val out = graft.queries.ExtQueries
      .winnowVerifyExact(spark, "/root/testdata/sf0.001")
      .select("n_shared", "lcs_run", "verified")
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (ns, run, v) =>
      assert(ns >= 2 && run >= 1)
      assert(v == (run >= 6))
    }
  }

  test("ring_assign on an empty ring fails loudly, not with a " +
      "buffer overread") {
    val df = Seq(1L).toDF("h")
    val e = intercept[Exception] {
      df.select(graft.functions.RingHash.ringAssign(col("h"),
        lit(Array.empty[Long]), lit(Array.empty[Long]))).collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ::: messages(t.getCause)
    assert(messages(e).exists(_.contains("ring has no nodes")),
      messages(e).mkString(" | "))
  }

  // ------------------------------------------------------ mmrRerank

  test("mmrRerank demotes the near-duplicate of the top hit") {
    // doc 2 is almost identical to doc 1 (higher rel than 3) but MMR
    // must pick the diverse doc 3 second
    val cand = Seq(
      (1L, 1.0, Seq("alpha", "beta", "gamma", "delta")),
      (2L, 0.9, Seq("alpha", "beta", "gamma", "epsilon")),
      (3L, 0.5, Seq("zeta", "eta", "theta", "iota")))
      .toDF("id", "rel", "toks")
    val out = Corpus.mmrRerank(cand, col("id"), col("rel"),
        col("toks"), k = 3)
      .select("rnk", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L))
  }

  test("mmrRerank: k beyond candidate count stops cleanly, scores descend-ish") {
    val cand = Seq(
      (1L, 2.0, Seq("a", "b")), (2L, 1.0, Seq("c", "d")))
      .toDF("id", "rel", "toks")
    val out = Corpus.mmrRerank(cand, col("id"), col("rel"),
      col("toks"), k = 5)
    assert(out.count() == 2)
  }

  test("mmrRerankGrouped: groups re-rank independently in one plan") {
    val cand = Seq(
      // group A: near-dup of the top hit must be demoted
      ("A", 1L, 1.0, Seq("alpha", "beta", "gamma", "delta")),
      ("A", 2L, 0.9, Seq("alpha", "beta", "gamma", "epsilon")),
      ("A", 3L, 0.5, Seq("zeta", "eta", "theta", "iota")),
      // group B: disjoint tokens — pure relevance order
      ("B", 4L, 0.3, Seq("k", "l")),
      ("B", 5L, 0.8, Seq("m", "n")))
      .toDF("q", "id", "rel", "toks")
    val out = Corpus.mmrRerankGrouped(cand, col("q"), col("id"),
        col("rel"), col("toks"), k = 3)
      .select("qid", "rnk", "id").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == "A").map(_._3).toSeq == Seq(1L, 3L, 2L))
    assert(out.filter(_._1 == "B").map(_._3).toSeq == Seq(5L, 4L))
  }

  test("mmrRerank runs ONE distributed plan — no per-pick driver jobs") {
    import java.util.concurrent.atomic.AtomicInteger
    val jobs = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val cand = (1 to 12).map(i =>
        (i.toLong, i.toDouble, Seq(s"t$i", s"u$i")))
      .toDF("id", "rel", "toks")
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = Corpus.mmrRerank(cand, col("id"), col("rel"),
        col("toks"), k = 12).collect().length
      assert(n == 12)
      // listener delivery is async — wait for the count to go quiet
      var prev = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 50) {
        Thread.sleep(100); waited += 1
        val cur = jobs.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      // the old shape ran k sequential limit(1).collect() jobs (12+);
      // the grouped plan is collect + AQE shuffle stages
      assert(jobs.get() <= 6, s"per-pick jobs leaked: ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // ----------------------------------------------- dimVarianceAudit

  test("dimVarianceAudit: constant dimension flagged dead, live one is not") {
    val vecs = (1 to 50).map { i =>
      (i.toLong, Array(0.25f, i.toFloat / 100f))
    }.toDF("id", "vec")
    val out = Similarity.dimVarianceAudit(vecs, col("vec"))
      .select("i", "variance", "is_dead", "n")
      .as[(Long, Double, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._3)                    // constant dim => dead
    assert(!out(1L)._3)                   // varying dim => live
    assert(out(0L)._2 === 0.0)
    assert(out(0L)._4 == 50 && out(1L)._4 == 50)
    // exact mean/variance on the known ramp .01..0.5: var of the
    // quantized values sits within quantization noise of the true one
    val trueVar = {
      val xs = (1 to 50).map(_ / 100.0)
      val m = xs.sum / 50
      xs.map(x => (x - m) * (x - m)).sum / 50
    }
    val gotVar = out(1L)._2
    assert(math.abs(gotVar - trueVar) < 1e-6)
  }
}
