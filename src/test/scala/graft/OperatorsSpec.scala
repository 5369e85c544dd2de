package graft

import org.apache.spark.sql.functions._

import graft.config.SourceConfig
import graft.ext.{Dedup, Multimodal, Similarity}
import graft.functions.TextFunctions
import graft.operators.Router

/** Router, dedup family, similarity, text, multimodal operator specs. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- router

  private val cfgs = Seq(
    SourceConfig("a", "gs://b/x/"),
    SourceConfig("ax", "gs://b/x", fileType = "CSV"),
    SourceConfig("all", "gs://b/"))

  test("router: first config in declaration order wins") {
    val uris = Seq("gs://b/x/f1", "gs://b/xy/f2", "gs://b/z/f3", "gs://other/f4")
      .toDF("uri")
    val got = Router.route(uris, cfgs).select("uri", "config_id")
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "gs://b/x/f1" -> "a",    // 'a' beats 'ax' and 'all'
      "gs://b/xy/f2" -> "ax",  // 'ax' prefix matches, 'a' does not
      "gs://b/z/f3" -> "all")) // only the catch-all
    // unmatched URI dropped
    assert(!got.contains("gs://other/f4"))
  }

  test("router: null URIs filtered; parquet filter is case-insensitive") {
    val uris = Seq(Some("gs://b/x/f1"), Some("gs://b/xy/f2"), None)
      .toDF("uri")
    val got = Router.routeParquet(uris, cfgs).as[(String, String)].collect()
    assert(got.toSet == Set("gs://b/x/f1" -> "a")) // CSV config filtered out
  }

  // -------------------------------------------------------------- dedup

  private val docs = Seq(
    (1L, "a b c d e f"),
    (2L, "a b c d e f"),     // exact dup of 1
    (3L, "a b c d e zzz"),   // near dup of 1
    (4L, "q w r t y u")      // unrelated
  ).toDF("doc_id", "text")

  test("ngram jaccard finds exact and near duplicates") {
    val pairs = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text",
        n = 3, threshold = 0.4)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("prefix-filtered jaccard join equals the all-pairs baseline " +
      "on real docs at every threshold") {
    val real = Tables(spark, "/root/testdata/sf0.001", "documents")
    val g = Dedup.shingles(real, $"doc_id", $"text", 3)
    val dfreq = g.groupBy($"gram").agg(count(lit(1)).as("dfr"))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      // the prefix plan invoked DIRECTLY (this corpus's harmless
      // sum-df^2 would dispatch the public API to brute)
      val fast = Dedup.jaccardPrefixFiltered(g, dfreq, t)
        .as[(Long, Long, Double)].collect().toSet
      val brute = Dedup.ngramJaccardPairsBrute(real, $"doc_id", $"text",
          n = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(fast == brute, s"threshold $t: prefix filter lost/added pairs")
    }
    // and the adaptive entry point agrees with both
    val viaApi = Dedup.ngramJaccardPairs(real, $"doc_id", $"text",
        n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val viaPrefix = Dedup.jaccardPrefixFiltered(g, dfreq, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaApi == viaPrefix)
  }

  test("containment prefix filter equals the all-pairs baseline on " +
      "real docs at every threshold") {
    val real = Tables(spark, "/root/testdata/sf0.001", "documents")
    val g = graft.Tables.materialize(
      Dedup.shingles(real, $"doc_id", $"text", 3))
    val dfreq = g.groupBy($"gram").agg(count(lit(1)).as("dfr"))
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val fast = Dedup.containmentPrefixFiltered(g, dfreq, t)
        .as[(Long, Long, Double, Double)].collect().toSet
      val brute = Dedup.containmentFromGrams(g, t)
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(fast == brute, s"threshold $t: prefix filter lost/added pairs")
    }
  }

  test("containment finds the excerpt pair Jaccard misses — via BOTH " +
      "physical paths") {
    val excerpt = Seq(
      (1L, "p q r s t"),                                   // the quote
      (2L, "p q r s t a b c d e f g h i j k l m n o"),     // quoting doc
      (3L, "z y x w v u"))                                 // unrelated
      .toDF("doc_id", "text")
    val g = graft.Tables.materialize(
      Dedup.shingles(excerpt, $"doc_id", $"text", 3))
    val dfreq = g.groupBy($"gram").agg(count(lit(1)).as("dfr"))
    for ((name, out) <- Seq(
        "brute" -> Dedup.containmentFromGrams(g, 0.9),
        "prefix" -> Dedup.containmentPrefixFiltered(g, dfreq, 0.9))) {
      val got = out.as[(Long, Long, Double, Double)].collect()
        .map { case (a, b, c12, c21) => (a, b) -> (c12, c21) }.toMap
      assert(got.keySet == Set((1L, 2L)), s"$name: $got")
      assert(got((1L, 2L))._1 == 1.0, name) // doc 1 fully contained
      // Jaccard on the same pair is low — the asymmetry is the point
      val j = Dedup.ngramJaccardPairsBrute(excerpt, $"doc_id", $"text",
        n = 3, threshold = 0.0).as[(Long, Long, Double)].collect()
        .collectFirst { case (1L, 2L, jac) => jac }.get
      assert(j < 0.5, s"$name: jaccard $j")
    }
  }

  test("planted ubiquitous gram: containment prefix candidates stay " +
      "linear while the brute join's candidate volume is quadratic") {
    // 120 docs, every one sharing a hot stopword trigram; the rest of
    // each doc is unique. The hot gram alone makes the all-pairs gram
    // self-join emit 120*119/2 = 7140 candidate pairs; rarest-first
    // prefixes never include it, so the prefix plan generates ZERO.
    val docs = (1 to 120).map { i =>
      val unique = (1 to 18).map(k => s"u${i}_$k").mkString(" ")
      (i.toLong, s"the of and $unique")
    }.toDF("doc_id", "text")
    val g = graft.Tables.materialize(
      Dedup.shingles(docs, $"doc_id", $"text", 3))
    val dfreq = graft.Tables.materialize(
      g.groupBy($"gram").agg(count(lit(1)).as("dfr")))
    val candVolume = dfreq
      .agg(sum($"dfr".cast("decimal(38,0)") * $"dfr"))
      .collect()(0).getDecimal(0)
    assert(candVolume.longValue >= 120L * 120L, s"fixture not hot: $candVolume")
    val nCand = Dedup.containmentPrefixCandidateCount(g, dfreq, 0.9)
    assert(nCand <= 120, s"prefix candidates blew up: $nCand")
    // and the paths still agree (both: no qualifying pairs)
    val fast = Dedup.containmentPrefixFiltered(g, dfreq, 0.9).count()
    val brute = Dedup.containmentFromGrams(g, 0.9).count()
    assert(fast == brute && fast == 0)
  }

  test("minhash signatures are identical for identical docs") {
    val sig = Dedup.minhashSignatures(docs, $"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(4L))
  }

  test("minhash LSH reports exact-dup candidates, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical docs share the sketch; all 64 bits used") {
    val s = Dedup.simhash(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(4L))
    // 64-bit sketch: some doc must set a bit above the old 32-bit range
    assert(s.values.exists(v => v < 0 || v >= (1L << 32)))
  }

  test("exact dedup keeps one deterministic representative") {
    val d = Dedup.exactDedup(docs, $"text", $"doc_id")
      .as[(String, Long)].collect().toMap
    assert(d("a b c d e f") == 1L) // min doc_id
    assert(d.size == 3)
  }

  test("minhash lsh band-bucket cap suppresses boilerplate blowup") {
    import graft.ext.Dedup
    // 12 identical docs: every band bucket holds all 12 -> capped away
    val docs = (1L to 12L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashLshPairs(docs, $"doc_id", $"text").count() == 66)
    assert(Dedup.minhashLshPairs(docs, $"doc_id", $"text",
      maxBandBucket = 5).count() == 0)
  }

  test("composed dedup pipeline honors the band-bucket cap and counts drops") {
    // 12 near-dup docs: unique lead token (distinct canon fp -> all
    // survive the exact pass), 20-token common tail (pairwise jaccard
    // 19/23 > 0.8 -> all verify as dups when candidates are generated)
    val tail = (0 until 20).map(i => s"w$i").mkString(" ")
    val near = (1L to 12L).map(i => (i, s"u$i $tail")).toDF("doc_id", "text")
    var dropped = 0L
    val keptDefault = Dedup.dedupPipelineKept(near, $"doc_id", $"text",
      onDroppedBuckets = dropped += _).count()
    assert(dropped == 0L) // 12 docs nowhere near the 10k default cap
    assert(keptDefault == 1L) // all near-dups collapse to doc 1
    // a tiny cap drops the hot shared-tail buckets — and reports them
    val keptCapped = Dedup.dedupPipelineKept(near, $"doc_id", $"text",
      maxBandBucket = 2, onDroppedBuckets = dropped += _).count()
    assert(dropped >= 1L)
    assert(keptCapped > keptDefault) // suppressed candidates kept docs
  }

  test("connected components collapse transitive chains to min id") {
    // 1-2-3-4 is a path (no direct 1~4 edge), 5-6 separate
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L))
      .toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
  }

  test("connected components converge immediately on an empty pair graph") {
    // a duplicate-free corpus yields zero verified pairs; emptiness is
    // decided BEFORE the loop (regression: dedupPipelineCcKept crashed
    // on any clean corpus when the in-loop null sum spun to maxRounds)
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.connectedComponents(empty, maxRounds = 4).count() == 0L)
    // and the composed CC pipeline keeps every doc of a clean corpus
    val clean = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"), (3L, "iota kappa lambda mu"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupPipelineCcKept(clean, $"doc_id", $"text").count() == 3L)
  }

  test("connected components: 10^5-node path graph stays O(log n) rounds " +
      "under reliable checkpointing") {
    // worst-case diameter for label propagation: a single path of 1e5
    // nodes. Path halving must converge in ~log2(n) rounds — a linear
    // round count here would be a 10^5x job-count blowup at corpus
    // scale. Run in the reliable-checkpoint mode (the cluster shape).
    val n = 100000L
    val dir =
      java.nio.file.Files.createTempDirectory("graft_cc_stress").toString
    val edges = spark.range(1L, n)
      .select($"id".as("id1"), ($"id" + 1L).as("id2"))
    var rounds = -1
    val cc = Dedup.connectedComponents(edges,
      checkpointDir = Some(dir), onRounds = rounds = _)
    assert(cc.count() == n)
    assert(cc.filter($"component" =!= 1L).count() == 0L) // one component
    withClue(s"rounds=$rounds: ") {
      assert(rounds > 0 && rounds <= 24) // log2(1e5) ~ 16.6 + margin
    }
  }

  test("connected components: in-loop null sum means overflow and throws") {
    // with emptiness excluded up front, a null decimal(38,0) sum inside
    // the loop can only be non-ANSI overflow (~10^19 max-long ids) —
    // which must THROW, never read as convergence (silent wrong
    // components). The decision helper is exercised directly: real
    // overflow needs more rows than any test can materialize.
    val e = intercept[ArithmeticException] {
      Dedup.ccSumConverged(null, new java.math.BigDecimal(7))
    }
    assert(e.getMessage.contains("overflow"))
    val five = new java.math.BigDecimal(5)
    assert(!Dedup.ccSumConverged(five, null)) // first round: no baseline
    assert(!Dedup.ccSumConverged(five, new java.math.BigDecimal(7)))
    assert(Dedup.ccSumConverged(five, new java.math.BigDecimal(5)))
  }

  test("connected components with fractional ids use the exact join check") {
    // labels 0.6 apart round to the same decimal(38,0) — the sum fast
    // path would converge prematurely on these; the join check must be
    // selected for non-integral label types and still produce exact
    // components
    val pairs = Seq((1.2, 0.6), (1.8, 1.2), (10.5, 9.9))
      .toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Double, Double)].collect().toMap
    assert(cc == Map(0.6 -> 0.6, 1.2 -> 0.6, 1.8 -> 0.6,
      9.9 -> 9.9, 10.5 -> 9.9))
  }

  test("connected components: reliable checkpoint mode + round guard") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    // one long chain (multiple halving rounds) + a separate 2-cluster
    val chain = ((1L until 30L).map(i => (i, i + 1)) :+ (100L, 101L))
      .toDF("id1", "id2")
    val cc = Dedup.connectedComponents(chain, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 32)
    assert((1L to 30L).forall(cc(_) == 1L))
    assert(cc(100L) == 100L && cc(101L) == 100L)
    // reliable checkpoint files actually landed in the configured dir
    assert(java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.exists(_.toFile.isFile))
    // an unreachably small round bound fails loudly instead of looping
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxRounds = 1)
    }
  }

  test("decontaminate: drops corpus docs sharing n-grams with the " +
      "benchmark, broadcasts the benchmark side") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // 3 shared grams
      (2L, "completely unrelated text about spark partitions here"),
      (3L, "the quick brown cat naps"), // only 1 shared gram ("the quick brown")
      (4L, "short")                     // < n tokens: no shingles, kept
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over a fence")
    ).toDF("bid", "btext")
    val kept = Dedup.decontaminate(corpus, $"doc_id", $"text",
      bench, $"btext", n = 3, minShared = 3)
    // doc 1 shares "the quick brown"/"quick brown fox"/"brown fox jumps"
    // (>= 3) -> dropped; doc 3 shares only 1 -> kept
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    // scale shape: the benchmark gram set rides a broadcast join
    assert(kept.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  // --------------------------------------------------------- similarity

  test("cosine of a vector with itself is 1; topk ranks by similarity") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 0.01f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs, $"vec_id", $"embedding",
      vecs.filter($"vec_id" === 1), $"vec_id", $"embedding", k = 3)
      .orderBy($"rank").select("nbr_id", "cosine")
      .as[(Long, Double)].collect()
    assert(top(0)._1 == 1L && math.abs(top(0)._2 - 1.0) < 1e-12)
    assert(top(1)._1 == 4L) // closest other vector
    assert(top.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("lsh: identical vectors share a bucket; near-dup pair found") {
    val vecs = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearDupPairs(vecs, $"vec_id", $"embedding",
        dim = 8, numPlanes = 4, threshold = 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ivf: query finds itself rank 1 within its probed cell") {
    // ids 1 and 2 seed the cells (smallest ids) — one per cluster
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // centroid: x cluster
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),   // centroid: z cluster
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // x cluster
      (4L, Array(0.0f, 0.1f, 0.9f, 0.0f)),   // z cluster
      (5L, Array(0.95f, 0.05f, 0.0f, 0.0f)), // x cluster
      (6L, Array(0.0f, 0.05f, 0.95f, 0.0f))) // z cluster
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(
      vecs, $"vec_id", $"embedding",
      vecs.filter($"vec_id" === 3 || $"vec_id" === 4),
      $"vec_id", $"embedding",
      k = 2, numCells = 2, nProbe = 1)
      .orderBy($"query_id", $"rank")
      .select("query_id", "nbr_id", "rank", "cosine")
      .as[(Long, Long, Int, Double)].collect()
    // each query's rank-1 hit is itself with cosine ~1
    val rank1 = got.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    assert(rank1 == Map(3L -> 3L, 4L -> 4L))
    assert(got.filter(_._3 == 1).forall(r => math.abs(r._4 - 1.0) < 1e-9))
    // nProbe=1: results come only from the query's own cluster cell
    assert(got.filter(_._1 == 3L).forall(r => Set(1L, 3L, 5L)(r._2)))
    assert(got.filter(_._1 == 4L).forall(r => Set(2L, 4L, 6L)(r._2)))
  }

  test("ivf persisted index: probe-from-disk equals the in-memory " +
      "path, and the assignment TABLE is authoritative (no re-assign " +
      "on probe)") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = corpus.filter($"vec_id" < 6)
    val (cent, assign) = Similarity.buildIvfIndex(corpus, $"vec_id",
      $"embedding", numCells = 8, iters = 2, sampleMod = 4)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivf_spec").toString
    cent.write.mode("overwrite").parquet(s"$tmp/cent")
    assign.write.mode("overwrite").parquet(s"$tmp/assign")
    val centD = spark.read.parquet(s"$tmp/cent")
    val assignD = spark.read.parquet(s"$tmp/assign")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val fromDisk = rows(Similarity.ivfTopKFromIndex(corpus, $"vec_id",
      $"embedding", queries, $"vec_id", $"embedding",
      k = 5, nProbe = 2, centD, assignD))
    val inMem = rows(Similarity.ivfTopK(corpus, $"vec_id", $"embedding",
      queries, $"vec_id", $"embedding",
      k = 5, numCells = 8, nProbe = 2, centroids = Some(cent)))
    assert(fromDisk == inMem)
    // authoritative table: DELETE every even nbr_id from the stored
    // assignment and probe ALL cells — a probe that re-assigned from
    // geometry would still surface even ids; one that reads the table
    // can only ever see the odd ones, and over all cells it must
    // equal brute force on the odd sub-corpus
    val oddOnly = assignD.filter($"nbr_id" % 2 === 1)
    val edited = rows(Similarity.ivfTopKFromIndex(corpus, $"vec_id",
      $"embedding", queries, $"vec_id", $"embedding",
      k = 5, nProbe = 8, centD, oddOnly))
    assert(edited.forall(_._2 % 2 == 1), "probe surfaced a deleted id")
    val bruteOdd = rows(Similarity.bruteForceTopK(
      corpus.filter($"vec_id" % 2 === 1), $"vec_id", $"embedding",
      queries, $"vec_id", $"embedding", k = 5))
    assert(edited == bruteOdd)
  }

  test("ivf append: assignment-only absorb equals full re-assignment " +
      "with frozen centroids, is idempotent, and READS the stored " +
      "centroids (an edit changes the delta)") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val standing = emb.filter($"vec_id" % 5 =!= 4)
    val incoming = emb.filter($"vec_id" % 5 === 4)
    val (cent, assign) = Similarity.buildIvfIndex(standing, $"vec_id",
      $"embedding", numCells = 8, iters = 2, sampleMod = 4)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivf_append_spec").toString
    cent.write.mode("overwrite").parquet(s"$tmp/cent")
    assign.write.mode("overwrite").parquet(s"$tmp/assign")
    val centD = spark.read.parquet(s"$tmp/cent")
    val assignD = spark.read.parquet(s"$tmp/assign")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("nbr_id", "cell_id").as[(Long, Long)].collect().toSet
    val appended = rows(Similarity.appendIvfAssignments(assignD,
      incoming, $"vec_id", $"embedding", centD))
    // == assigning the UNION corpus from scratch with the same centroids
    val rebuilt = rows(Similarity.cellAssignmentsFor(emb, $"vec_id",
      $"embedding", centD))
    assert(appended == rebuilt)
    // replayed batch is a no-op (anti-join skips present ids)
    val replayed = Similarity.appendIvfAssignments(assignD, incoming,
      $"vec_id", $"embedding", centD)
    assert(rows(Similarity.appendIvfAssignments(replayed, incoming,
      $"vec_id", $"embedding", centD)) == appended)
    // centroids are READ, not retrained: zeroing out all but one
    // stored centroid must re-route the incoming delta
    import org.apache.spark.sql.functions.{col => c, transform => tr, lit => l}
    val squashed = centD
      .withColumn("cx", when(c("cell_id") === centD
          .agg(org.apache.spark.sql.functions.min("cell_id"))
          .collect()(0).getLong(0), c("cx")).otherwise(l(0.0)))
    val editedDelta = rows(Similarity.appendIvfAssignments(assignD,
      incoming, $"vec_id", $"embedding", squashed))
    assert(editedDelta != appended,
      "append ignored the stored centroid values")
  }

  test("ivf: k-means centroids beat smallest-id seeds on a clustered " +
      "corpus (recall@5 vs brute force)") {
    // 4 orthogonal clusters; ids arranged so ALL smallest-id seeds land
    // in cluster 0 (the adversarial case for id-seeding: real corpora
    // don't sort ids by embedding region). Jitter dims 4-5 + a common
    // dim 6 make cell assignment non-tied but meaningless under the
    // cluster-0-only seeds; Lloyd's rounds must move the centroids to
    // the actual density.
    def vec(cluster: Int, id: Long): Array[Float] = {
      val v = Array.fill(8)(0.0f)
      v(cluster) = 1.0f
      v(4) = 0.2f * ((id * 7) % 5) / 4f
      v(5) = 0.2f * ((id * 13) % 7) / 6f
      v(6) = 0.1f
      v
    }
    val corpus = (0 until 4).flatMap { c =>
      (1L to 12L).map(j => (c * 12 + j, vec(c, c * 12 + j)))
    }.toDF("vec_id", "embedding")
    val queries = (0 until 4).map { c =>
      val v = Array.fill(8)(0.0f); v(c) = 1.0f; v(6) = 0.1f
      (100L + c, v)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, $"vec_id", $"embedding",
        queries, $"vec_id", $"embedding", k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(centroids: Option[org.apache.spark.sql.DataFrame]): Double = {
      val got = Similarity.ivfTopK(corpus, $"vec_id", $"embedding",
          queries, $"vec_id", $"embedding",
          k = 5, numCells = 4, nProbe = 1, centroids = centroids)
        .select("query_id", "nbr_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, want) =>
        got.getOrElse(q, Set.empty).count(want).toDouble / want.size
      }.sum / exact.size
    }
    val seeded = recall(None)
    val trained = recall(Some(Similarity.kmeansCentroids(
      corpus, $"vec_id", $"embedding", numCells = 4, iters = 3)))
    withClue(s"seeded=$seeded trained=$trained: ") {
      assert(trained > seeded)
      assert(trained >= 0.75)
    }
  }

  test("pq: encode is deterministic against frozen codebooks; adc " +
      "ranking respects cluster structure") {
    // 4 clusters in 8 dims (the kmeans fixture shape): PQ codes must
    // send a query to its own cluster's members
    def vec(cluster: Int, id: Long): Array[Float] = {
      val v = Array.fill(8)(0.0f)
      v(cluster) = 1.0f
      v(4) = 0.2f * ((id * 7) % 5) / 4f
      v(5) = 0.2f * ((id * 13) % 7) / 6f
      v
    }
    // ids interleave clusters (cluster = (id-1) % 4) so the
    // smallest-id seeds span the density — the same seeding
    // sensitivity the kmeans fixture documents
    val corpus = (1L to 48L).map(i => (i, vec(((i - 1) % 4).toInt, i)))
      .toDF("vec_id", "embedding")
    val (cbs, codes) = Similarity.buildPqIndex(corpus, $"vec_id",
      $"embedding", m = 4, ksub = 4, iters = 2)
    val codeRows = codes.collect()
    assert(codeRows.length == 48 * 4) // m codes per vector
    // re-encoding against the SAME codebooks is bit-identical — the
    // frozen-artifact property that makes PQ append ≡ re-encode
    val again = Similarity.pqEncode(corpus, $"vec_id", $"embedding", cbs)
      .collect()
    assert(codeRows.map(_.toString).sorted
      sameElements again.map(_.toString).sorted)
    val queries = (0 until 4).map { c =>
      val v = Array.fill(8)(0.0f); v(c) = 1.0f; v(6) = 0.1f
      (100L + c, v)
    }.toDF("vec_id", "embedding")
    val cand = corpus.select($"vec_id".as("nbr_id"))
      .crossJoin(broadcast(queries.select($"vec_id".as("query_id"))))
    val top = Similarity.pqAdcTopK(cand, codes,
        Similarity.pqAdcTable(queries, $"vec_id", $"embedding", cbs),
        k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
    // every query's top-5 lands inside its own cluster
    top.foreach { case (q, n) =>
      val c = (q - 100L).toInt
      assert(((n - 1) % 4).toInt == c,
        s"query $q (cluster $c) retrieved out-of-cluster neighbor $n")
    }
  }

  test("residual ivf-pq retrieves own-cluster neighbors on clustered " +
      "data") {
    // where the coarse quantizer captures real structure, residual
    // codes must keep retrieval cluster-faithful (the layout's win
    // case; the gate corpus documents the near-uniform loss case)
    def vec(cluster: Int, id: Long): Array[Float] = {
      val v = Array.fill(8)(0.0f)
      v(cluster) = 1.0f
      v(4) = 0.2f * ((id * 7) % 5) / 4f
      v(5) = 0.2f * ((id * 13) % 7) / 6f
      v
    }
    val corpus = (1L to 48L).map(i => (i, vec(((i - 1) % 4).toInt, i)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 4).map { c =>
      val v = Array.fill(8)(0.0f); v(c) = 1.0f; v(6) = 0.1f
      (100L + c, v)
    }.toDF("vec_id", "embedding")
    val top = Similarity.ivfPqResidualTopK(corpus, $"vec_id",
        $"embedding", queries, $"vec_id", $"embedding",
        k = 5, numCells = 4, nProbe = 1, m = 4, ksub = 4, iters = 2)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
    assert(top.length == 4 * 5)
    top.foreach { case (q, n) =>
      val c = (q - 100L).toInt
      assert(((n - 1) % 4).toInt == c,
        s"query $q (cluster $c) retrieved out-of-cluster neighbor $n")
    }
    // TRAINED coarse cells (the production layout): same fixture,
    // cells from Lloyd's rounds instead of smallest-id seeds —
    // retrieval must stay cluster-faithful through the unit-centroid
    // residual path
    val trainedTop = Similarity.ivfPqResidualTopK(corpus, $"vec_id",
        $"embedding", queries, $"vec_id", $"embedding",
        k = 5, numCells = 4, nProbe = 1, m = 4, ksub = 4, iters = 2,
        centroids = Some(Similarity.kmeansCentroids(corpus, $"vec_id",
          $"embedding", numCells = 4, iters = 3)))
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
    assert(trainedTop.length == 4 * 5)
    trainedTop.foreach { case (q, n) =>
      val c = (q - 100L).toInt
      assert(((n - 1) % 4).toInt == c,
        s"query $q (cluster $c) retrieved out-of-cluster neighbor $n " +
          "under trained cells")
    }
  }

  test("opq rotation preserves inner products and spreads the " +
      "dominant variance direction") {
    // anisotropic fixture: dim 0 carries ~100x any other dim's
    // variance — the axis-aligned-split pathology OPQ exists for
    val corpus = (1L to 40L).map { i =>
      val v = Array.tabulate(8) { d =>
        if (d == 0) (((i * 7) % 11) - 5).toFloat
        else ((((i * (d + 3)) % 3) - 1) * 0.1).toFloat
      }
      (i, v)
    }.toDF("vec_id", "embedding")
    val x = corpus.orderBy("vec_id")
      .as[(Long, Seq[Float])].collect().map(_._2.map(_.toDouble))
    val y = Similarity.opqRotate(corpus, $"vec_id", $"embedding", dim = 8)
      .orderBy("vid").as[(Long, Seq[Double])].collect().map(_._2)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (p, q) => p * q }.sum
    // orthogonal map: every pairwise inner product survives (up to
    // the Dec(28,12) rounding of the projection coefficient)
    for (a <- 0 until 10; b <- a until 10)
      assert(math.abs(dot(y(a), y(b)) - dot(x(a), x(b))) < 1e-6,
        s"dot($a,$b) moved: ${dot(x(a), x(b))} -> ${dot(y(a), y(b))}")
    def dimVar(rows: Array[Seq[Double]], d: Int): Double = {
      val vs = rows.map(_(d))
      val m = vs.sum / vs.length
      vs.map(v => (v - m) * (v - m)).sum / vs.length
    }
    // the dominant direction lands on the balanced diagonal: dim 0's
    // variance must spread across all 8 dims (~1/8 each)
    val pre0 = dimVar(x, 0)
    val post0 = dimVar(y, 0)
    assert(post0 < 0.5 * pre0,
      s"dim-0 variance did not spread: $pre0 -> $post0")
  }

  test("kmeans byte-budget guard trips on a wide-dim sample and names " +
      "the budget") {
    // 64 rows × 256 dims × 8 B = 131072 B > the 65536 B budget — a
    // row-count guard alone would never see this
    val wide = (1L to 64L).map(i => (i, Array.fill(256)(i / 64.0f)))
      .toDF("vec_id", "embedding")
    spark.conf.set("spark.graft.kmeans.maxSampleBytes", "65536")
    try {
      val e = intercept[IllegalArgumentException] {
        Similarity.kmeansCentroids(wide, $"vec_id", $"embedding",
          numCells = 4, iters = 1)
      }
      assert(e.getMessage.contains("maxSampleBytes=65536"))
      assert(e.getMessage.contains("256 dims"))
      // under budget at a higher sampleMod: trains fine
      spark.conf.set("spark.graft.kmeans.maxSampleBytes", "1048576")
      assert(Similarity.kmeansCentroids(wide, $"vec_id", $"embedding",
        numCells = 4, iters = 1).count() == 4 * 256)
    } finally spark.conf.unset("spark.graft.kmeans.maxSampleBytes")
  }

  test("multi-table lsh drops degenerate buckets at the cap") {
    // 20 identical vectors collide into ONE bucket in every table —
    // the O(n^2) degenerate case the cap exists for
    val vecs = (1L to 20L).map(i => (i, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    def run(cap: Int) = Similarity.lshNearDupPairs(
      vecs, $"vec_id", $"embedding", dim = 8, numPlanes = 4,
      threshold = 0.9, numTables = 2, maxBucketSize = cap).count()
    assert(run(1000) == 190) // C(20,2): uncapped, all pairs surface
    assert(run(5) == 0)      // capped: the giant bucket contributes none
  }

  // -------------------------------------------------------------- bloom

  test("bloomSemiJoin equals the exact semi-join and the bloom prunes") {
    import graft.ext.Bloom
    val fact = spark.range(0, 10000).toDF("k")
    val dim = spark.range(0, 10000, 100).toDF("d") // 1% selectivity
    val got = Bloom.bloomSemiJoin(fact, $"k", dim, $"d",
      expectedItems = 100L, fpp = 0.01)
      .as[Long].collect().toSet
    val exact = fact.join(dim, $"k" === $"d", "left_semi")
      .as[Long].collect().toSet
    assert(got == exact && got.size == 100)
    // the bloom stage alone prunes the fact side hard (≥ 90% gone)
    val bits = Bloom.optimalNumBits(100L, 0.01)
    val bloom = dim.agg(Bloom.bloomAgg($"d", 100L, bits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val passed = fact.filter(Bloom.bloomContains(lit(bloom), $"k")).count()
    assert(passed >= 100 && passed < 1000)
  }

  test("bloomSemiJoin stays exact even with an absurdly small bloom") {
    import graft.ext.Bloom
    val fact = spark.range(0, 2000).toDF("k")
    val dim = Seq(3L, 777L, 1999L).toDF("d")
    // 64 bits for 3 keys -> false positives guaranteed at this size;
    // the exact semi-join must absorb them all
    val got = Bloom.bloomSemiJoin(fact, $"k", dim, $"d",
      expectedItems = 3L, fpp = 0.5)
      .as[Long].collect().toSet
    assert(got == Set(3L, 777L, 1999L))
  }

  // --------------------------------------------------------------- text

  test("text functions: counts, ratios, langid markers") {
    val df = Seq("the cat and the dog!", "der hund und die katze ist")
      .toDF("text")
    val got = df.select(
      TextFunctions.tokenCount($"text"),
      TextFunctions.stopwordRatio($"text"),
      TextFunctions.langId($"text")).collect()
    assert(got(0).getInt(0) == 5)
    assert(math.abs(got(0).getDouble(1) - 3.0 / 5) < 1e-12)
    assert(got(0).getString(2) == "en")
    assert(got(1).getString(2) == "de")
  }

  test("redactPii scrubs emails, IPs and phone runs; clean text unchanged") {
    val df = Seq(
      "write to alice.smith+spam@mail-host.example.org today",
      "server at 10.0.255.3 answered",
      "call +1-555-867-5309 or 5558675309 now",
      "no pii here at all",
      "mixed: bob@x.io from 192.168.1.1 dialed 555-123-4567")
      .toDF("text")
    val got = df.select(TextFunctions.redactPii($"text"),
      TextFunctions.piiCount($"text")).as[(String, Int)].collect()
    assert(got(0) == (("write to <EMAIL> today", 1)))
    assert(got(1) == (("server at <IP> answered", 1)))
    assert(got(2) == (("call <PHONE> or <PHONE> now", 2)))
    assert(got(3) == (("no pii here at all", 0)))
    assert(got(4) == (("mixed: <EMAIL> from <IP> dialed <PHONE>", 3)))
  }

  test("maskWord masks whole words only and rejects non-token input") {
    val df = Seq("data database data-base dataset my data").toDF("text")
    val got = df.select(TextFunctions.maskWord($"text", "data"))
      .as[String].head()
    // 'database'/'dataset' untouched; 'data-base' has a boundary at '-'
    assert(got == "<MASK> database <MASK>-base dataset my <MASK>")
    intercept[IllegalArgumentException] {
      TextFunctions.maskWord($"text", "a.b")
    }
  }

  test("canonical fingerprint ignores token order and duplication") {
    val df = Seq(("a", "x y z"), ("b", "z y x x"), ("c", "x y q"))
      .toDF("id", "text")
    val fp = df.select($"id",
      TextFunctions.canonicalFingerprint($"text")).as[(String, String)]
      .collect().toMap
    assert(fp("a") == fp("b") && fp("a") != fp("c"))
  }

  // --------------------------------------------------------- multimodal

  test("multimodal: stub decode is deterministic; frames slice bytes") {
    val media = Multimodal.withBinaryContent(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(f(1L).fp == f(2L).fp) // same bytes, same fingerprint
    assert(f(1L).n_bytes == "a b c d e f".length)
    assert(f(1L).width >= 1 && f(1L).width <= 640)
    val frames = Multimodal.sampleFrames(media, 4, 4, 2)
      .filter($"media_id" === 1).orderBy($"frame_idx")
      .select("frame_hex").as[String].collect()
    assert(frames(0) == "a b ".map(c => "%02x".format(c.toInt)).mkString)
  }

  test("multimodal: ImageIoDecoder decodes real PNG dimensions through " +
      "the per-partition lifecycle; non-images isolate as (0,0)") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800) // non-trivial pixel
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, png(7, 5)), (2L, png(320, 200)),
      (3L, "not an image at all".getBytes("UTF-8")))
    val media = rows.toDF("media_id", "content")
      .repartition(2) // >1 partition: one decoder instance per partition
      .withColumn("meta", struct(lit("image/png").as("mime"),
        length($"content").as("n_bytes")))
    val f = Multimodal.extractFeatures(
        media, () => new Multimodal.ImageIoDecoder)
      .collect().map(m => m.media_id -> m).toMap
    assert(f(1L).width == 7L && f(1L).height == 5L)
    assert(f(2L).width == 320L && f(2L).height == 200L)
    assert(f(3L).width == 0L && f(3L).height == 0L) // isolated, not thrown
    assert(f(3L).n_bytes == rows(2)._2.length.toLong)
    assert(f.values.map(_.fp).toSet.size == 3) // payload-content md5
  }

  test("multimodal: resize geometry — aspect fit, no upscale, min-1 " +
      "clamp, area-ratio payload, undecodable isolation") {
    // decoder that reads dimensions from a "WxH:" payload prefix
    class PrefixDims extends Multimodal.MediaDecoder {
      def decode(bytes: Array[Byte]): (Long, Long, String) = {
        val s = new String(bytes, "UTF-8")
        val m = "^(\\d+)x(\\d+):".r.findFirstMatchIn(s)
        m.map(g => (g.group(1).toLong, g.group(2).toLong, "fp"))
          .getOrElse((0L, 0L, "fp"))
      }
    }
    def pay(prefix: String) = prefix + "p" * (100 - prefix.length)
    val rows = Seq(
      (1L, pay("640x480:")), // exact 2x downscale
      (2L, pay("1000x001:")), // extreme aspect: min-1 clamp
      (3L, pay("100x50:")), // fits the box: untouched
      (4L, pay("nodims:"))) // undecodable
    val media = rows.toDF("media_id", "text")
      .select($"media_id", $"text".cast("binary").as("content"))
      .repartition(2)
    val r = Multimodal.resizeMedia(media, 320, 240, () => new PrefixDims)
      .collect().map(m => m.media_id -> m).toMap
    assert(r(1L).out_w == 320L && r(1L).out_h == 240L)
    assert(r(1L).out_bytes == 100L / 4) // area ratio 1/4 of 100 bytes
    assert(r(2L).out_w == 320L && r(2L).out_h == 1L) // floor(320/1000)->1
    assert(r(3L).out_w == 100L && r(3L).out_h == 50L) // no upscale
    assert(r(3L).out_bytes == 100L) // untouched payload size
    assert(r(4L) == Multimodal.ResizedMedia(4L, 0L, 0L, 0L, ""))
    // the stub re-encode is the deterministic payload prefix
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(rows.head._2.getBytes("UTF-8").take(25))
      .map("%02x".format(_)).mkString
    assert(r(1L).out_fp == expect)
  }
}
