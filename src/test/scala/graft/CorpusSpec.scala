package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** Corpus-preparation operator specs ([[graft.ext.Corpus]]). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------- latestByKey

  test("latestByKey keeps the newest row per key, ties by id") {
    val df = Seq(
      (1L, "a", 10L, 100L, "old"),
      (1L, "a", 20L, 101L, "new"),
      (1L, "b", 5L, 102L, "only"),
      (2L, "a", 20L, 103L, "tie-lo"),
      (2L, "a", 20L, 104L, "tie-hi"))
      .toDF("k1", "k2", "ts", "id", "v")
    val got = Corpus.latestByKey(df, Seq("k1", "k2"), Seq("ts", "id"))
      .select("k1", "k2", "v").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a", "new"), (1L, "b", "only"),
      (2L, "a", "tie-hi")))
  }

  test("latestByKey preserves all payload columns") {
    val df = Seq((1L, 2L, 3L, "x")).toDF("k", "ord", "extra", "s")
    val out = Corpus.latestByKey(df, Seq("k"), Seq("ord"))
    assert(out.columns.toSet == Set("k", "ord", "extra", "s"))
  }

  // ------------------------------------------------------- sampling

  test("hashSample is a deterministic subset at roughly the asked rate") {
    val df = spark.range(2000).toDF("id")
    val a = Corpus.hashSample(df, col("id"), 4).as[Long].collect().toSet
    val b = Corpus.hashSample(df, col("id"), 4).as[Long].collect().toSet
    assert(a == b)                         // deterministic
    assert(a.size > 300 && a.size < 700)   // ~4/16 = 25% of 2000
    // monotone: a smaller rate selects a subset of a larger rate
    val tiny = Corpus.hashSample(df, col("id"), 1).as[Long].collect().toSet
    assert(tiny.subsetOf(a))
  }

  test("stratifiedQuota caps every stratum and is deterministic") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 3).cast("string").as("g"))
    val got = Corpus.stratifiedQuota(df, col("g"), col("id"), 7)
    val byG = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG == Map("0" -> 7L, "1" -> 7L, "2" -> 7L))
    val again = Corpus.stratifiedQuota(df, col("g"), col("id"), 7)
      .select("id").as[Long].collect().toSet
    assert(again == got.select("id").as[Long].collect().toSet)
    // a stratum smaller than the quota survives whole
    val small = df.filter(col("id") < 4)
    assert(Corpus.stratifiedQuota(small, col("g"), col("id"), 7).count() == 4)
  }

  test("weightedSample: rate tracks the weight, is deterministic, " +
      "and extreme weights are total/empty") {
    val df = spark.range(4000).toDF("id")
    val half = Corpus.weightedSample(df, col("id"), lit(0.5))
      .as[Long].collect().toSet
    assert(half.size > 1700 && half.size < 2300) // ~50%
    assert(Corpus.weightedSample(df, col("id"), lit(0.5))
      .as[Long].collect().toSet == half)        // deterministic
    assert(Corpus.weightedSample(df, col("id"), lit(1.0)).count() == 4000)
    assert(Corpus.weightedSample(df, col("id"), lit(0.0)).count() == 0)
    assert(Corpus.weightedSample(df, col("id"), lit(7.5)).count() == 4000)
    assert(Corpus.weightedSample(df, col("id"), lit(-3.0)).count() == 0)
    // monotone: a heavier weight keeps a superset of a lighter one
    val quarter = Corpus.weightedSample(df, col("id"), lit(0.25))
      .as[Long].collect().toSet
    assert(quarter.subsetOf(half))
  }

  test("mixtureSample applies per-stratum rates with a default") {
    val df = spark.range(3000)
      .select(col("id"), (col("id") % 3).cast("string").as("g"))
    val got = Corpus.mixtureSample(df, col("g"), col("id"),
      rates = Map("0" -> 1.0, "1" -> 0.25), defaultRate = 0.0)
    val byG = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("0") == 1000L)                       // rate 1: everything
    assert(byG.getOrElse("2", 0L) == 0L)            // default 0: nothing
    val n1 = byG.getOrElse("1", 0L)
    assert(n1 > 150 && n1 < 350)                    // ~25% of 1000
  }

  test("shardAssign covers [0,n), positions are 1..|shard| and stable") {
    val df = spark.range(500).toDF("id")
    val got = Corpus.shardAssign(df, col("id"), 8)
      .select(col("id"), col("shard"), col("pos"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == 500)
    val shards = got.map(_._2).toSet
    assert(shards.subsetOf((0L until 8L).toSet) && shards.size == 8)
    // per-shard positions are exactly 1..count (a permutation)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // content-derived: same assignment on a differently-partitioned input
    val again = Corpus.shardAssign(df.repartition(13), col("id"), 8)
      .select(col("id"), col("shard"), col("pos"))
      .as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("shardAssign drives a training-read layout: partitioned write, " +
      "positions contiguous per shard, file rows in position order") {
    val out = "/tmp/graft_shards_spec"
    val assigned = Corpus.shardAssign(spark.range(300).toDF("id"),
      col("id"), 4)
    // the layout pairing documented on shardAssign: co-locate each
    // shard, lay rows out in position order, one dir per shard
    assigned.repartition(col("shard")).sortWithinPartitions(col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 300)
    // positions are exactly 1..n within every shard directory
    back.groupBy("shard")
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"),
        max(col("pos")).as("mx"))
      .as[(Long, Long, Long, Long)].collect().foreach {
        case (_, n, mn, mx) => assert(mn == 1L && mx == n)
      }
    // rows inside each parquet file are physically in position order
    // (sequential training reads need no sort)
    back.select(input_file_name().as("f"), col("pos"))
      .as[(String, Long)].collect().groupBy(_._1).foreach {
        case (_, rows) =>
          val ps = rows.map(_._2).toSeq
          assert(ps == ps.sorted)
      }
  }

  // -------------------------------------------------- vocab / tfidf

  test("vocabTopK counts whitespace tokens, drops empties, ranks") {
    val docs = Seq("b a  a", "a c b", "").toDF("text")
    val got = Corpus.vocabTopK(docs, col("text"), 2)
      .select("token", "n", "rank").as[(String, Long, Long)].collect()
      .sortBy(_._3)
    assert(got.toSeq == Seq(("a", 3L, 1L), ("b", 2L, 2L)))
  }

  test("tfIdf computes tf, df and ratio-idf score") {
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("id", "text")
    val got = Corpus.tfIdf(docs, col("id"), col("text"))
      .select("doc_id", "token", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, "x")) == ((2L, 2L, 2.0 * (2.0 / 2.0))))
    assert(got((1L, "y")) == ((1L, 1L, 1.0 * (2.0 / 1.0))))
    assert(got((2L, "z")) == ((1L, 1L, 2.0)))
    assert(got.size == 4)
  }

  // ---------------------------------------------- edit-distance pairs

  test("editDistancePairs joins within blocks and bounds the distance") {
    val docs = Seq(
      (1L, "b1", "kitten plays"),
      (2L, "b1", "sitten plays"),   // dist 1 to doc 1
      (3L, "b1", "zzzzzzzzzzzz"),   // far from both
      (4L, "b2", "kitten plays"))   // identical text, different block
      .toDF("id", "blk", "text")
    val got = Corpus.editDistancePairs(docs, col("id"), col("text"),
      col("blk"), prefixLen = 12, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("fuzzyJoinDeletion finds EXACTLY the naive lev<=1 pair set " +
    "(lossless blocking, seeded strings)") {
    // seeded pseudo-random 4-6 char strings over a 6-letter alphabet:
    // dense enough that substitution/insert/delete/equal pairs all
    // occur, plus planted neighbors of every edit kind
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    val base = (1L to 120L).map { i =>
      val n = 4 + rnd.nextInt(3)
      (i, (0 until n).map(_ => alpha(rnd.nextInt(6))).mkString)
    }
    val planted = Seq(
      (201L, "abcd"), (202L, "abed"),  // substitution
      (203L, "abcde"),                 // insertion vs 201
      (204L, "abc"),                   // deletion vs 201
      (205L, "abcd"))                  // exact dup of 201
    val docs = (base ++ planted).toDF("id", "k")
    val got = Corpus.fuzzyJoinDeletion(docs, col("id"), col("k"))
      .as[(Long, Long, Long)].collect().toSet
    val naive = {
      val all = (base ++ planted)
      (for {
        (ia, ka) <- all; (ib, kb) <- all if ia < ib
        d = {  // reference Levenshtein
          val dp = Array.tabulate(ka.length + 1)(i =>
            Array.tabulate(kb.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
          for (i <- 1 to ka.length; j <- 1 to kb.length)
            dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
              dp(i - 1)(j - 1) + (if (ka(i - 1) == kb(j - 1)) 0 else 1))
          dp(ka.length)(kb.length)
        } if d <= 1
      } yield (ia, ib, d.toLong)).toSet
    }
    assert(naive.exists(_._3 == 0L) && naive.exists(_._3 == 1L))
    assert(got == naive)
  }

  test("repetitionStats: known ratios, single-token and repeated-text edges") {
    val docs = Seq(
      (1L, "a b a b a b"),   // 3 distinct? a,b -> dup 1-2/6; bigrams: "a b"x3,"b a"x2 -> 3/5
      (2L, "w x y z"),       // all distinct -> 0; all bigrams unique -> 1/3
      (3L, "solo")           // one token: no bigrams -> 0, dup 0
    ).toDF("doc_id", "text")
    val r = graft.ext.Corpus.repetitionStats(docs, $"doc_id", $"text")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) == ((1.0 - 2.0 / 6.0, 3.0 / 5.0)))
    assert(r(2L) == ((0.0, 1.0 / 3.0)))
    assert(r(3L) == ((0.0, 0.0)))
  }

  // ------------------------------------------------- outlier trim

  test("winsorize clamps to per-group percentiles; interior untouched") {
    // group a: 1..100 -> p10=10.9, p90=90.1 (linear interpolation);
    // group b: constant -> bounds equal, nothing clamps
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq.fill(10)(("b", 5.0))).toDF("g", "v")
    val w = Corpus.winsorize(df, $"g", $"v", 0.1, 0.9)
    val a = w.filter($"g" === "a")
      .select($"v", $"value_w", $"winsor_lo", $"winsor_hi")
      .as[(Double, Double, Double, Double)].collect()
    val (lo, hi) = (a.head._3, a.head._4)
    assert(math.abs(lo - 10.9) < 1e-9 && math.abs(hi - 90.1) < 1e-9)
    a.foreach { case (v, vw, _, _) =>
      assert(vw == math.min(math.max(v, lo), hi))
    }
    assert(a.count(t => t._2 != t._1) == 20) // 10 clamped each side
    val b = w.filter($"g" === "b").select($"value_w").as[Double].collect()
    assert(b.forall(_ == 5.0) && b.length == 10)
  }

  // ------------------------------------------ chunking / packing

  test("chunkTokens: overlapping windows, short tail, empty doc dropped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6"),  // 6 tokens, size 4 stride 2
      (2L, "only"),
      (3L, "  "))                 // no tokens -> no chunks
      .toDF("doc_id", "text")
    val got = Corpus.chunkTokens(docs, $"doc_id", $"text", 4, 2)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t3 t4 t5 t6", 4L),
      (1L, 2L, "t5 t6", 2L),
      (2L, 0L, "only", 1L)))
  }

  test("chunkTokens with stride == size tiles without overlap") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Corpus.chunkTokens(docs, $"doc_id", $"text", 5, 5)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(got.length == 2)
    assert(got(0)._3 == "w1 w2 w3 w4 w5" && got(1)._3 == "w6 w7 w8 w9 w10")
    // every token appears exactly once across chunks
    assert(got.flatMap(_._3.split(" ")).length == 10)
  }

  test("packSequences: offsets are exclusive prefix sums; straddle range " +
      "is correct; layout is partitioning-independent") {
    val docs = (1L to 40L).map(i => (i, Seq.fill(10)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Corpus.packSequences(docs, $"doc_id", $"text",
      budget = 16, nShards = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 40)
    got.groupBy(_._2).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._4)
      // offsets within a shard are the running sum of earlier docs
      inOrder.zipWithIndex.foreach { case ((_, _, n, off, f, l), i) =>
        assert(n == 10L)
        assert(off == 10L * i)
        assert(f == off / 16)
        assert(l == (off + n - 1) / 16)
        // a 10-token doc on a 16 budget straddles at most one cut
        assert(l - f <= 1)
      }
    }
    // content-derived: identical on a different input partitioning
    val again = Corpus.packSequences(docs.repartition(7), $"doc_id",
      $"text", budget = 16, nShards = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("packSequences drops zero-token docs and every sequence id in " +
      "[0, last] is produced") {
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "d e"), (4L, "f"))
      .toDF("doc_id", "text")
    val got = Corpus.packSequences(docs, $"doc_id", $"text",
      budget = 2, nShards = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(1L, 3L, 4L))
    // total 6 tokens, budget 2 -> sequences 0,1,2 all covered
    val covered = got.flatMap(r => r._5 to r._6).toSet
    assert(covered == Set(0L, 1L, 2L))
  }

  // ------------------------------------------------- gated queries

  test("corpus gated queries run at sf0.001 and key invariants hold") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.CorpusQueries.queries
    val latest = q("dedup_latest")(spark, dir)
    // one row per (user, event_type)
    assert(latest.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
    val strat = q("sample_stratified")(spark, dir)
    assert(strat.groupBy("lang").count()
      .filter(col("count") > 40).count() == 0)
    val vocab = q("vocab_topk")(spark, dir)
    assert(vocab.count() <= 100 && vocab.count() > 0)
    val tfidf = q("tfidf_topk")(spark, dir)
    assert(tfidf.groupBy("doc_id").count()
      .filter(col("count") > 5).count() == 0)
    val so = q("set_ops")(spark, dir)
    // 'both' and 'click_only' partition the click-user set
    assert(so.select("id").distinct().count() == so.count())
    assert(q("shard_assign")(spark, dir).count() ==
      Tables(spark, dir, "documents").count())
    assert(q("sample_hash")(spark, dir).count() > 0)
    assert(q("edit_distance")(spark, dir).columns.toSet ==
      Set("id_a", "id_b", "dist"))
  }

  // ---------------------------------------------- stripRepeatedTiles

  test("stripRepeatedTiles drops planted boilerplate, keeps unique text " +
      "in order") {
    val header = "terms of service apply to all visitors here" // 8 tokens
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$header iota kappa lambda mu nu xi omicron pi"),
      (3L, "rho sigma tau upsilon phi chi psi omega")) // no boilerplate
      .toDF("doc_id", "text")
    val out = ext.Corpus.stripRepeatedTiles(docs, col("doc_id"),
        col("text"), tileTokens = 8, minFreq = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // docs 1-2: header tile shared -> dropped; unique tail kept intact
    assert(out(0) == ((1L, 2L, 1L,
      "alpha beta gamma delta epsilon zeta eta theta")))
    assert(out(1) == ((2L, 2L, 1L, "iota kappa lambda mu nu xi omicron pi")))
    // doc 3 untouched
    assert(out(2) == ((3L, 1L, 0L, "rho sigma tau upsilon phi chi psi omega")))
  }

  // ----------------------------------------------------- shuffleRank

  test("shuffleRank is an exact permutation matching the window order " +
      "and is partition-count invariant") {
    val df = spark.range(0L, 500L).select(col("id").as("doc_id"))
    val ranked = ext.Corpus.shuffleRank(df, col("doc_id"), 7)
      .as[(Long, Long)].collect().toMap
    // permutation 0..n-1
    assert(ranked.values.toSeq.sorted == (0L until 500L))
    // matches the single-partition window reference order
    val ref = df
      .withColumn("_h",
        org.apache.spark.sql.functions.md5(
          concat(lit("shuf|"), col("doc_id").cast("string"))))
      .orderBy(col("_h"), col("doc_id"))
      .select(col("doc_id")).as[Long].collect()
    ref.zipWithIndex.foreach { case (id, i) =>
      assert(ranked(id) == i.toLong, s"doc $id")
    }
    // boundary-independent: a different partition count, same ranks
    val ranked3 = ext.Corpus.shuffleRank(df, col("doc_id"), 3)
      .as[(Long, Long)].collect().toMap
    assert(ranked3 == ranked)
  }

  test("shuffleRank at 10^6 rows: exact permutation, asserted " +
      "distributed (no driver materialization)") {
    val df = spark.range(0L, 1000000L)
      .select(col("id").as("doc_id"))
    val r = ext.Corpus.shuffleRank(df, col("doc_id"), 64)
    val row = r.agg(
      count(lit(1)).as("n"),
      countDistinct(col("shuffle_pos")).as("nd"),
      org.apache.spark.sql.functions.min(col("shuffle_pos")).as("mn"),
      org.apache.spark.sql.functions.max(col("shuffle_pos")).as("mx"))
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((1000000L, 1000000L, 0L, 999999L)))
  }

  test("retrieval_pipeline_e2e: every query group serves exactly k " +
      "diverse picks with contiguous ranks, and every pick matches " +
      "at least one of its query's terms") {
    val out = queries.CorpusQueries
      .retrievalPipelineE2e(spark, "/root/testdata/sf0.001")
      .select("query_id", "rnk", "doc_id")
      .as[(Long, Long, Long)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(1L, 2L, 3L, 4L))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 5L))
      assert(rows.map(_._3).distinct.length == 5) // no repeated docs
    }
    // each picked doc actually contains >= 1 of its query's terms
    val terms = Map(
      1L -> Set("spark", "table", "query"),
      2L -> Set("hash", "join", "merge"),
      3L -> Set("stream", "batch", "window"),
      4L -> Set("scan", "filter", "column"))
    val texts = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out.foreach { case (q, _, d) =>
      assert(texts(d).split("\\s+").toSet.intersect(terms(q)).nonEmpty,
        s"doc $d in query $q matches no query term")
    }
  }
}
