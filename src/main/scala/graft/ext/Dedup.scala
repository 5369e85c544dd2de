package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, in increasing
  * scalability order:
  *
  *  - exact:        hash-groupBy on content — one shuffle.
  *  - n-gram Jaccard: exact shingle-set similarity via a shingle
  *    self-join — quadratic in bucket size, the correctness baseline.
  *  - MinHash+LSH:  signature bands bucket the join so only candidate
  *    pairs meet — the 100 TB path (shuffle volume O(docs×bands), not
  *    O(docs²)).
  *  - SimHash:      one 64-bit sketch per doc; near-dups share the
  *    sketch (or a 16-bit band of it) — cheapest, coarsest.
  *
  * Hash primitive is [[TextFunctions.hash32]]/md5 so every stage is
  * reproducible in the DuckDB oracle (no engine-private hash).
  */
object Dedup {

  /** Exact dedup: keep one representative row per exact `key` (min of
    * `keep` makes the choice deterministic). */
  def exactDedup(df: DataFrame, key: Column, keep: Column): DataFrame =
    df.groupBy(key.as("dedup_key")).agg(min(keep).as("kept"))

  /** Word shingles (n-grams of tokens) as a distinct-exploded frame:
    * (id, gram). The base relation for Jaccard and MinHash.
    *
    * Two deliberate shapes for scale: tokens are materialized as a
    * column BEFORE the gram lambda (a lambda body re-evaluates embedded
    * expressions per element — with split() inlined that made gram
    * building O(len²) per doc in interpreted eval), and narrow inputs
    * are widened to the session's parallelism (a single-file local scan
    * is 1 partition; the gram explosion is the expensive stage, so it
    * must run wide). */
  def shingles(df: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    shinglesFromToks(tokenize(df, id, text), n)

  /** Tokenized (id, toks) frame — the shared upstream of
    * [[shinglesFromToks]] / [[winnowFingerprintsFromToks]]. Audits
    * that need several gram sizes over the same corpus (e.g. the
    * winnowing recall audit at k ∈ {3, 5}) materialize this ONCE and
    * derive every k from the cached token arrays instead of
    * re-reading and re-splitting the corpus per gram size. Widened to
    * the session's parallelism: a single-file local scan is 1
    * partition and the downstream gram explosion is the expensive
    * stage, so it must run wide. */
  def tokenize(df: DataFrame, id: Column, text: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.select(id.as("id"), TextFunctions.tokens(text).as("toks"))
      .repartition(p)
  }

  /** Gram explosion over a prepared (id, toks) frame — see
    * [[shingles]]. Tokens are a materialized column BEFORE the gram
    * lambda (a lambda body re-evaluates embedded expressions per
    * element — with split() inlined that made gram building O(len²)
    * per doc in interpreted eval). */
  def shinglesFromToks(toked: DataFrame, n: Int): DataFrame = {
    // grams[i] = toks[i..i+n-1], for i in 1..len-n+1 (slice is 1-based)
    val grams = when(size(col("toks")) >= n,
      transform(sequence(lit(1), size(col("toks")) - (n - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
      .otherwise(array())
    toked.select(col("id"), explode(array_distinct(grams)).as("gram"))
  }

  /** Exact thresholded Jaccard similarity join via AllPairs/PPJoin
    * prefix filtering — same output as [[ngramJaccardPairsBrute]] for
    * any input and threshold, WITHOUT the all-pairs gram self-join.
    *
    * Why it's lossless: order all grams by a global canonical order
    * (document frequency asc, gram asc — rarest first). For a doc
    * with `sz` distinct grams, Jaccard ≥ τ against any partner forces
    * an intersection of at least ceil(τ·sz) grams, so the doc's first
    * `sz - ceil(τ·sz) + 1` grams in that order (its PREFIX) must
    * contain the globally-minimal intersection gram — and that same
    * gram is in the partner's prefix too (the order is global). Hence
    * joining prefixes on gram finds every qualifying pair; exact
    * verification on the full gram sets then computes the true
    * Jaccard. The prefix length uses `floor` (≥ the ideal ceil-based
    * length) so float jitter in τ·sz can only LENGTHEN the prefix —
    * never lose a pair.
    *
    * Scale shape: rarest-first prefixes make the candidate join's
    * buckets small exactly where the data is big — a stopword-like
    * gram shared by millions of docs lands at the END of every doc's
    * order and never enters a prefix unless a doc is nearly all
    * stopwords. The heavy frames are one df aggregate over grams, one
    * per-doc ranking window (partitioned by doc), the prefix
    * self-join, and a per-candidate `array_intersect` over two
    * doc-bounded gram arrays. */
  /** Brute candidate volume above which the prefix-filtered plan is
    * selected: Σ df² (the EXACT row count of the all-pairs gram
    * self-join before aggregation) beyond ~268M rows means the
    * quadratic path is paying real shuffle volume; below it, the
    * simple self-join's single shuffle beats the prefix plan's fixed
    * overhead (two extra gram-corpus shuffles + per-doc sorts —
    * measured 3.4s vs 2.1s at sf0.1's trivial Σdf²=2.8M). */
  private val JaccardBruteMaxCandVolume = new java.math.BigDecimal(1L << 28)

  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.5): DataFrame =
    ngramJaccardPairsFromToks(tokenize(df, id, text), n, threshold)

  /** [[ngramJaccardPairs]] over a prepared (id, toks) frame — lets
    * multi-k audits share ONE tokenization. Same adaptive Σ df²
    * dispatch, same output. */
  def ngramJaccardPairsFromToks(toked: DataFrame,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, "0 < threshold <= 1")
    val g = graft.Tables.materialize(shinglesFromToks(toked, n))
    // dfreq is materialized too: the dispatch scalar reads it once
    // and the prefix path joins it again — without the cache that
    // full gram-frequency aggregate would run twice
    val dfreq = graft.Tables.materialize(
      g.groupBy(col("gram")).agg(count(lit(1)).as("dfr")))
    // adaptive physical choice, same logical result either way (the
    // spec proves path equality): Σ df² predicts the brute join's
    // output exactly — the one scalar that separates "hot grams
    // square the work" corpora from harmless ones. One tiny aggregate
    // over the cached gram frequencies; exact decimal, no overflow.
    // SUM over zero rows is null — an empty/sub-n-token corpus
    // dispatches to brute, which flows through empty gracefully.
    val candVolume = Option(dfreq
      .agg(sum(col("dfr").cast("decimal(38,0)") * col("dfr")))
      .collect()(0).getDecimal(0))
      .getOrElse(java.math.BigDecimal.ZERO)
    if (candVolume.compareTo(JaccardBruteMaxCandVolume) <= 0)
      jaccardFromGrams(g, threshold)
    else jaccardPrefixFiltered(g, dfreq, threshold)
  }

  /** AllPairs/PPJoin prefix filter over a prepared shingle frame —
    * the quadratic-safe physical plan [[ngramJaccardPairs]] selects
    * when Σ df² explodes. Per-doc (dfr, gram) structs sorted IN
    * MEMORY per group (cheaper than a ranking window, which
    * shuffle-sorts every gram row); the prefix cut slices the STRUCT
    * array first so the HOF lambda only touches prefix-length
    * arrays. floor-based length ≥ the ideal ceil-based one, so float
    * jitter in τ·sz can only lengthen the prefix, never lose a
    * pair. Package-visible so the equality spec can exercise this
    * path directly on corpora whose Σ df² would dispatch to brute. */
  private[graft] def jaccardPrefixFiltered(g: DataFrame, dfreq: DataFrame,
      threshold: Double): DataFrame = {
    val byDoc = graft.Tables.materialize(
      g.join(dfreq, "gram")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("dfr"), col("gram"))))
            .as("fg"),
          count(lit(1)).as("sz")))
    val prefix = byDoc.select(col("id"),
      explode(transform(
        slice(col("fg"), lit(1),
          (col("sz") - floor(col("sz") * lit(threshold)) + lit(1))
            .cast("int")),
        s => s.getField("gram"))).as("gram"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    def side(sfx: String) = byDoc.select(col("id").as(s"id$sfx"),
      transform(col("fg"), s => s.getField("gram")).as(s"g$sfx"),
      col("sz").as(s"sz$sfx"))
    cand.join(side("1"), "id1").join(side("2"), "id2")
      .withColumn("inter",
        size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** All-pairs gram self-join Jaccard over a prepared shingle frame. */
  private def jaccardFromGrams(g: DataFrame, threshold: Double): DataFrame = {
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = g.as("a").join(g.as("b"), col("a.gram") === col("b.gram"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** The all-pairs baseline: every gram co-occurrence becomes a
    * candidate — quadratic in the hottest gram's bucket.
    * [[ngramJaccardPairs]] dispatches here at harmless Σ df²; the
    * equality spec verifies the prefix plan against it. */
  def ngramJaccardPairsBrute(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.5): DataFrame =
    jaccardFromGrams(graft.Tables.materialize(shingles(df, id, text, n)),
      threshold)

  /** Exact thresholded DIRECTED-containment join — c(A→B) =
    * |grams(A) ∩ grams(B)| / |grams(A)|, one row per unordered pair
    * with both directions (`c12`, `c21`), kept when either direction
    * ≥ `threshold`. The asymmetric near-dup relation Jaccard misses:
    * a short document quoted inside a long one has high containment
    * but low Jaccard.
    *
    * Same adaptive dispatch as [[ngramJaccardPairs]] (the Σ df²
    * scalar predicts the brute join's exact output size), but the
    * scale path is NOT the Jaccard prefix filter and NOT MinHash-LSH:
    * LSH bands estimate JACCARD, and containment-high/Jaccard-low
    * pairs — the ones this operator exists for — collide with
    * vanishing probability, so LSH candidates would silently drop
    * them. The lossless bound instead comes from the CONTAINED side
    * alone: if c(A→B) ≥ τ then at most ⌊(1−τ)·|A|⌋ of A's grams are
    * absent from B, so B must share at least one of A's first
    * ⌊(1−τ)·|A|⌋+1 grams in the global rarest-first (df asc, gram
    * asc) order. Candidates = contained-side PREFIX grams joined
    * against the partner's FULL gram set (both docs emit prefixes,
    * covering both directions); exact verification then computes
    * both ratios on the candidate pairs only. Hot stopword-like
    * grams land at the end of every rarest-first order and enter a
    * prefix only when a doc is nearly all stopwords, so the
    * candidate join's buckets stay small exactly where df² explodes
    * — the spec pins both path equality and the no-blowup bound on a
    * planted ubiquitous gram. */
  def containmentPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.9): DataFrame = {
    require(threshold > 0 && threshold <= 1, "0 < threshold <= 1")
    val g = graft.Tables.materialize(shingles(df, id, text, n))
    val dfreq = graft.Tables.materialize(
      g.groupBy(col("gram")).agg(count(lit(1)).as("dfr")))
    val candVolume = Option(dfreq
      .agg(sum(col("dfr").cast("decimal(38,0)") * col("dfr")))
      .collect()(0).getDecimal(0))
      .getOrElse(java.math.BigDecimal.ZERO)
    if (candVolume.compareTo(JaccardBruteMaxCandVolume) <= 0)
      containmentFromGrams(g, threshold)
    else containmentPrefixFiltered(g, dfreq, threshold)
  }

  /** All-pairs gram self-join containment over a prepared shingle
    * frame — the oracle's algebra, selected at harmless Σ df². */
  private[graft] def containmentFromGrams(g: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    def d(c: Column) = c.cast("double")
    inter
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), "id2")
      .select(col("id1"), col("id2"),
        (d(col("inter")) / d(col("sz1"))).as("c12"),
        (d(col("inter")) / d(col("sz2"))).as("c21"))
      .filter(col("c12") >= threshold || col("c21") >= threshold)
  }

  /** Contained-side prefix filter over a prepared shingle frame —
    * the quadratic-safe physical plan [[containmentPairs]] selects
    * when Σ df² explodes. Prefix length ⌊(1−τ)·sz⌋+1 uses `floor` of
    * `sz·τ` (`sz − floor(sz·τ) + 1` ≥ the ideal ⌊(1−τ)·sz⌋+1), so
    * float jitter can only LENGTHEN the prefix — never lose a pair.
    * Package-visible for the path-equality spec. */
  private[graft] def containmentPrefixFiltered(g: DataFrame,
      dfreq: DataFrame, threshold: Double): DataFrame = {
    val byDoc = graft.Tables.materialize(
      g.join(dfreq, "gram")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("dfr"), col("gram"))))
            .as("fg"),
          count(lit(1)).as("sz")))
    val prefix = byDoc.select(col("id"),
      explode(transform(
        slice(col("fg"), lit(1),
          (col("sz") - floor(col("sz") * lit(threshold)) + lit(1))
            .cast("int")),
        s => s.getField("gram"))).as("gram"))
    // contained-side prefix probes the partner's FULL gram frame;
    // both docs emit prefixes, so both directions are covered
    val cand = prefix.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"))
      .distinct()
    def side(sfx: String) = byDoc.select(col("id").as(s"id$sfx"),
      transform(col("fg"), s => s.getField("gram")).as(s"g$sfx"),
      col("sz").as(s"sz$sfx"))
    def d(c: Column) = c.cast("double")
    cand.join(side("1"), "id1").join(side("2"), "id2")
      .withColumn("inter",
        size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .select(col("id1"), col("id2"),
        (d(col("inter")) / d(col("sz1"))).as("c12"),
        (d(col("inter")) / d(col("sz2"))).as("c21"))
      .filter(col("c12") >= threshold || col("c21") >= threshold)
  }

  /** Candidate pair count of the prefix-filtered containment plan —
    * spec instrumentation for the no-blowup bound. */
  private[graft] def containmentPrefixCandidateCount(g: DataFrame,
      dfreq: DataFrame, threshold: Double): Long = {
    val byDoc = g.join(dfreq, "gram")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("dfr"), col("gram"))))
          .as("fg"),
        count(lit(1)).as("sz"))
    val prefix = byDoc.select(col("id"),
      explode(transform(
        slice(col("fg"), lit(1),
          (col("sz") - floor(col("sz") * lit(threshold)) + lit(1))
            .cast("int")),
        s => s.getField("gram"))).as("gram"))
    prefix.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"))
      .distinct()
      .count()
  }

  /** Benchmark decontamination: drop corpus documents sharing at
    * least `minShared` distinct word n-grams with ANY benchmark
    * document — the standard pre-training step that removes
    * evaluation-set leakage from training data.
    *
    * Scale shape: the benchmark side is an eval suite — thousands of
    * documents against a 100 TB corpus — so its DISTINCT gram set is
    * broadcast and the corpus is filtered in one wide pass: shingle
    * explode -> broadcast join on gram -> per-doc hit count ->
    * flagged-id anti-join. The corpus never shuffles on gram content;
    * the only shuffled frame is the per-doc count of MATCHED grams
    * (bounded by benchmark overlap, not corpus size). Shingles are
    * distinct per doc, so the hit count is the distinct-gram overlap
    * by construction. */
  def decontaminate(corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchText: Column, n: Int = 3,
      minShared: Int = 1): DataFrame = {
    val bg = shingles(bench, lit(0L), benchText, n)
      .select(col("gram")).distinct()
    val cg = shingles(corpus, corpusId, corpusText, n)
    val flagged = cg.join(broadcast(bg), "gram")
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minShared)
      .select(col("id"))
    corpus.join(flagged, corpusId === col("id"), "left_anti")
  }

  /** Universal-hash-family prime (smallest prime > 2^32). */
  val MinhashP: Long = 4294967311L

  /** Deterministic minhash coefficients (a_j odd < 2^30 so
    * h * a_j + b_j stays < 2^63 in every engine; b_j < 2^32), derived
    * from md5 so oracle SQL can embed the same literals. */
  def minhashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { j =>
      (TextFunctions.hash32Local(s"a_$j") % (1L << 30) | 1L,
        TextFunctions.hash32Local(s"b_$j"))
    }

  /** MinHash signature: one portable 32-bit base hash per gram
    * (md5-derived), then numHashes linear transforms
    * `(h * a_j + b_j) mod P` min-aggregated per doc — one md5 per gram
    * total, not per (gram, seed). Output: (id, sig_0 … sig_{k-1}),
    * all longs. */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 16): DataFrame =
    minhashSignaturesFromShingles(shingles(df, id, text, n), numHashes)

  /** Same, from a pre-built (id, gram) shingle frame — lets a composed
    * pipeline build the shingles ONCE and reuse them for both candidate
    * generation and Jaccard verification. */
  def minhashSignaturesFromShingles(g: DataFrame,
      numHashes: Int = 16): DataFrame = {
    val hashed = g.withColumn("h", TextFunctions.hash32(col("gram")))
    val aggs = minhashParams(numHashes).zipWithIndex.map { case ((a, b), j) =>
      min((col("h") * a + b) % MinhashP).as(s"sig_$j")
    }
    hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH candidate pairs: split the signature into bands of
    * `rowsPerBand`, hash each band, and emit pairs that collide in at
    * least one band. Scales as O(docs × bands) shuffle, never O(docs²):
    * the band-explode + groupBy replaces the all-pairs join.
    *
    * `maxBandBucket` is the skew guard for the within-bucket self-join:
    * a band value shared by more than that many docs (boilerplate /
    * templated corpora) would reintroduce O(n²) inside one bucket, so
    * such buckets are dropped from candidate generation. Default
    * unbounded, which keeps the oracle exact — size it (e.g. 10_000)
    * for production corpora; an exact-dup pre-pass (canonical
    * fingerprint, as in [[dedupSurvivorsAndVerified]]) removes the
    * most common cause first. */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
      maxBandBucket: Int = Int.MaxValue): DataFrame =
    minhashLshPairsFromShingles(shingles(df, id, text, n), numHashes,
      rowsPerBand, maxBandBucket)

  /** Candidate pairs from a pre-built shingle frame.
    *
    * `onDroppedBuckets` (optional) is the A3-style observability hook
    * for the skew cap: when a finite `maxBandBucket` is set it receives
    * the number of band buckets dropped for exceeding the cap — a
    * monitoring dashboard needs to see HOW MUCH candidate recall the
    * cap is trading away on a given corpus. Computed as one extra
    * aggregation over the already-cached band frame (cheap), only when
    * the hook is provided. */
  /** MinHash band rows (id, band, bh) for a shingle frame — the
    * PERSISTABLE unit of the LSH index: a standing corpus stores
    * exactly this frame (O(docs × bands) rows, no text, no grams) and
    * incremental ingest probes it ([[incrementalLshDedup]]) instead
    * of ever re-shingling history. */
  def minhashBandRows(g: DataFrame, numHashes: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val sig = minhashSignaturesFromShingles(g, numHashes)
    val numBands = numHashes / rowsPerBand
    val bands = array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*))
          .as("bh"))
    }: _*)
    sig.select(col("id"), explode(bands).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  def minhashLshPairsFromShingles(g: DataFrame, numHashes: Int = 16,
      rowsPerBand: Int = 4, maxBandBucket: Int = Int.MaxValue,
      onDroppedBuckets: Long => Unit = null): DataFrame = {
    // cache: both sides of the self-join would otherwise recompute the
    // full shingle+signature pipeline
    val explodedM = graft.Tables.materialize(
      minhashBandRows(g, numHashes, rowsPerBand))
    val kept =
      if (maxBandBucket == Int.MaxValue) explodedM
      else {
        val sized = explodedM.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("bsz"))
        if (onDroppedBuckets != null)
          onDroppedBuckets(sized.filter(col("bsz") > maxBandBucket).count())
        val small = sized.filter(col("bsz") <= maxBandBucket)
          .select(col("band"), col("bh"))
        explodedM.join(broadcast(small), Seq("band", "bh"), "left_semi")
      }
    kept.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
  }

  /** SimHash near-duplicate candidate pairs: band the 64-bit sketch
    * into 4 16-bit words (near-dups agree on at least one word with
    * high probability), self-join per band bucket, then verify with the
    * exact Hamming distance `bit_count(s1 xor s2) <= maxBits`.
    * Same O(docs x bands) scaling story as MinHash LSH — and the
    * 16-bit bands give 65536 buckets per band, so the per-bucket
    * self-join work is O(n²/65536) instead of the O(n²/256) an 8-bit
    * banding would leave at corpus scale. */
  def simhashNearDupPairs(df: DataFrame, id: Column, text: Column,
      maxBits: Int = 12): DataFrame = {
    val sk = graft.Tables.materialize(simhash(df, id, text))
    val bands = sk.select(col("id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(65535).as("bv"))): _*))
          .as("b"))
      .select(col("id"), col("b.band"), col("b.bv"))
    // Salted self-join: synthetic/boilerplate-heavy corpora cluster
    // many docs into one band value, and an equi-join computes that
    // bucket's O(k²) candidate pairs in ONE task (measured: 21 s of
    // single-task CPU at sf0.1). Salting the right side by id hash
    // and replicating the left across the 8 salt cells splits each
    // bucket's pair work 8 ways; each (id1,id2) pair still arises in
    // exactly one salt cell per band, so the result set is unchanged.
    val S = 8
    val ys = bands.withColumn("s",
      pmod(xxhash64(col("id")), lit(S.toLong)).cast("int"))
    val xs = bands.withColumn("s",
      explode(array((0 until S).map(i => lit(i)): _*)))
    val cand = xs.as("x").join(ys.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
    cand
      .join(sk.select(col("id").as("id1"), col("simhash").as("s1")), "id1")
      .join(sk.select(col("id").as("id2"), col("simhash").as("s2")), "id2")
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .filter(col("hamming") <= maxBits)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Production default for the composed pipelines' band-bucket cap:
    * far above any honest near-dup cluster (the canonical-fingerprint
    * pre-pass has already removed exact dups by the time LSH runs), far
    * below the bucket size where the within-bucket self-join's O(n²)
    * becomes the job's dominant cost. */
  val DefaultMaxBandBucket = 10000

  /** Shared spine of the composed dedup pipelines:
    * 1. canonical-fingerprint exact pass (kills exact + reordered dups
    *    for the cost of one groupBy);
    * 2. shingles built ONCE and reused by stages 3 and 4;
    * 3. MinHash LSH candidate generation on the survivors — band
    *    buckets larger than `maxBandBucket` dropped (skew guard;
    *    `onDroppedBuckets` observes how many);
    * 4. exact n-gram Jaccard verification of candidates only (never
    *    all-pairs).
    * Returns (survivors(id, text), verified(id1, id2)). Every stage is
    * the O(docs)-shuffle scale path; the quadratic work is confined to
    * LSH buckets, and the cap bounds the worst bucket. */
  /** Exact-Jaccard verification of a candidate pair frame against a
    * shingle frame: keeps (id1, id2, jaccard) for candidates whose
    * true gram Jaccard meets `threshold`. The verify cost is
    * proportional to the CANDIDATE set (two gram joins + one
    * aggregate), never to all pairs — the step every LSH/banding
    * recall path funnels through before acting on a match. */
  def verifiedPairsFromCandidates(g: DataFrame, cand: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(g.as("va"), col("id1") === col("va.id"))
      .join(g.as("vb"),
        col("id2") === col("vb.id") && col("va.gram") === col("vb.gram"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  def dedupSurvivorsAndVerified(df: DataFrame, id: Column, text: Column,
      n: Int = 3, jaccardThreshold: Double = 0.8,
      maxBandBucket: Int = DefaultMaxBandBucket,
      onDroppedBuckets: Long => Unit = null): (DataFrame, DataFrame) = {
    val (s, _, v) = dedupStagesWithCandidates(df, id, text, n,
      jaccardThreshold, maxBandBucket, onDroppedBuckets)
    (s, v)
  }

  /** [[dedupSurvivorsAndVerified]] with the LSH CANDIDATE frame
    * exposed — (survivors, candidates, verified): the stage-cost
    * audit reads the generator's raw volume (and the bytes the verify
    * stage must touch) BEFORE verification prunes it.
    *
    * `materializeCand` caches + eager-counts the candidate frame —
    * ONLY the stage-cost path (which aggregates `cand` separately
    * from the verify join) should pay that: with it on by default,
    * every dedup gate funneling through [[dedupSurvivorsAndVerified]]
    * would run an extra count job and pin the largest dedup
    * intermediate in cache to serve one audit query. */
  def dedupStagesWithCandidates(df: DataFrame, id: Column, text: Column,
      n: Int = 3, jaccardThreshold: Double = 0.8,
      maxBandBucket: Int = DefaultMaxBandBucket,
      onDroppedBuckets: Long => Unit = null,
      materializeCand: Boolean = false)
      : (DataFrame, DataFrame, DataFrame) = {
    val canon = df.select(id.as("id"), text.as("text"))
      .withColumn("canon_fp", TextFunctions.canonicalFingerprint(col("text")))
    val firstPerFp = canon.groupBy(col("canon_fp")).agg(min(col("id")).as("id"))
    val survivors = graft.Tables.materialize(canon.join(firstPerFp.select(col("id")), "id")
      .select(col("id"), col("text")))
    val g = graft.Tables.materialize(shingles(survivors, col("id"), col("text"), n))
    val cand0 = minhashLshPairsFromShingles(g,
      maxBandBucket = maxBandBucket, onDroppedBuckets = onDroppedBuckets)
    val cand =
      if (materializeCand) graft.Tables.materialize(cand0) else cand0
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(g.as("ga"), col("id1") === col("ga.id"))
      .join(g.as("gb"),
        col("id2") === col("gb.id") && col("ga.gram") === col("gb.gram"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
    val verified = inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .filter(col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")).cast("double")
        >= jaccardThreshold)
      .select(col("id1"), col("id2"))
    (survivors, cand, verified)
  }

  /** Composed dedup with GREEDY keep-lowest-id per verified pair: drops
    * every id2. Kept as the simple/oracle-friendly baseline; transitive
    * chains A~B~C with no A~C candidate keep both A and C — use
    * [[dedupPipelineCcKept]] when that matters. */
  def dedupPipelineKept(df: DataFrame, id: Column, text: Column,
      n: Int = 3, jaccardThreshold: Double = 0.8,
      maxBandBucket: Int = DefaultMaxBandBucket,
      onDroppedBuckets: Long => Unit = null): DataFrame = {
    val (survivors, verified) = dedupSurvivorsAndVerified(
      df, id, text, n, jaccardThreshold, maxBandBucket, onDroppedBuckets)
    keptFrom(survivors, verified)
  }

  /** [[dedupPipelineKept]]'s greedy keeper over PRECOMPUTED
    * survivors/verified frames — the entry point for callers that
    * read the chain's intermediates from a persisted store instead of
    * recomputing them. */
  def keptFrom(survivors: DataFrame, verified: DataFrame): DataFrame =
    survivors.join(verified.select(col("id2").as("id")).distinct(),
      Seq("id"), "left_anti").select(col("id"))

  /** [[dedupPipelineCcKept]]'s component keeper over PRECOMPUTED
    * survivors/verified frames. */
  def ccKeptFrom(survivors: DataFrame, verified: DataFrame): DataFrame = {
    val cc = connectedComponents(verified)
    val dropped = cc.filter(col("id") =!= col("component")).select(col("id"))
    survivors.join(dropped, Seq("id"), "left_anti").select(col("id"))
  }

  /** Incremental NEAR-dup dedup of a new batch against a STANDING
    * corpus — the nightly-ingest composition exact fingerprints only
    * half-cover: the standing corpus participates as
    * two persisted side tables, never re-read at text width and never
    * re-shingled:
    *
    *  - `bandIndex` (id, band, bh) — [[minhashBandRows]] of everything
    *    retained so far, O(history × bands) rows;
    *  - `historyFps` (fp) — the canonical-fingerprint ledger, exactly
    *    [[dedupIncremental]]'s.
    *
    * Pipeline: (1) batch-internal first-wins on canonical fingerprint
    * + anti-join against the fp ledger (exact dups die before any
    * shingling); (2) shingle + sign + band ONLY the batch survivors;
    * (3) candidates = batch bands probing the index (history side,
    * history ALWAYS wins regardless of id order — the standing corpus
    * is never dropped) ∪ the batch-internal band self-join (smaller
    * id wins); (4) texts of CANDIDATE history docs only are fetched
    * (semi-join into `history`) and re-shingled — O(candidates), not
    * O(history); (5) exact Jaccard verification on candidates;
    * (6) kept = batch survivors minus verified losers. Returns
    * (kept ids, index delta) — the delta is the kept docs' band rows,
    * appended to the index table for the next ingest.
    *
    * When history ids precede batch ids and the standing corpus is
    * itself deduped (the steady state this operator maintains), the
    * kept set EQUALS the full-corpus [[dedupPipelineKept]] of the
    * union restricted to the batch — the spec pins that equality, and
    * a second spec passes a history frame containing ONLY candidate
    * docs to prove non-candidate history text is never consulted.
    * Batch and history id spaces must be disjoint. */
  def incrementalLshDedup(batch: DataFrame, id: Column, text: Column,
      bandIndex: DataFrame, history: DataFrame,
      histId: Column, histText: Column, historyFps: DataFrame,
      n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8): (DataFrame, DataFrame) = {
    val canon = batch.select(id.as("id"), text.as("text"))
      .withColumn("fp", TextFunctions.canonicalFingerprint(col("text")))
    val firstPerFp = canon.groupBy(col("fp")).agg(min(col("id")).as("id"))
    val surv = graft.Tables.materialize(
      canon.join(firstPerFp.select(col("id")), "id")
        .join(historyFps.select(col("fp")), Seq("fp"), "left_anti")
        .select(col("id"), col("text")))
    val gb = graft.Tables.materialize(
      shingles(surv, col("id"), col("text"), n))
    val bBands = graft.Tables.materialize(
      minhashBandRows(gb, numHashes, rowsPerBand))
    val candHist = bBands.as("y").join(bandIndex.as("x"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
    val candBatch = bBands.as("x").join(bBands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
    val cand = graft.Tables.materialize(
      candHist.unionByName(candBatch).distinct())
    // fetch + shingle CANDIDATE history docs only
    val histCand = history.select(histId.as("id"), histText.as("text"))
      .join(cand.select(col("id1").as("id")), Seq("id"), "left_semi")
    val gh = shingles(histCand, col("id"), col("text"), n)
    val verified = verifiedPairsFromCandidates(
      gb.unionByName(gh), cand, threshold)
    val kept = surv
      .join(verified.select(col("id2").as("id")).distinct(),
        Seq("id"), "left_anti")
      .select(col("id"))
    val delta = bBands.join(kept, Seq("id"), "left_semi")
    (kept, delta)
  }

  /** Band-index MAINTENANCE — the compaction pass a standing
    * [[minhashBandRows]] index needs after many
    * [[incrementalLshDedup]] append cycles and corpus deletions:
    * tombstoned docs' rows pruned (anti-join against the deleted-id
    * frame), duplicate band rows collapsed (idempotent re-appends /
    * replayed batches), output sorted-by-(band, bh) within
    * partitions so the rewritten files cluster probe keys together
    * (parquet row-group stats then prune probes the way Z-order
    * prunes range scans). One anti-join + one distinct — O(index),
    * never touches text. */
  def compactBandIndex(index: DataFrame, deleted: DataFrame): DataFrame =
    index
      .join(deleted.select(col("id")), Seq("id"), "left_anti")
      .distinct()
      // RANGE partition on (band, bh): hash-by-band alone would give
      // only numBands giant output files at corpus scale; ranging the
      // composite keeps files balanced AND bh-clustered
      .repartitionByRange(col("band"), col("bh"))
      .sortWithinPartitions(col("band"), col("bh"))

  /** Connected components over an undirected pair frame (id1, id2):
    * min-label propagation WITH path halving (pointer jumping). Each
    * round every node takes the min label among itself and its
    * neighbors, then compresses one pointer hop
    * (`label <- label(label)`), so long paths collapse in O(log n)
    * rounds instead of O(diameter) — plain propagation measured
    * minutes on sf0.1's chained near-dup clusters, halving takes a
    * handful of rounds. Labels are always node ids of the same
    * component and non-increasing; at fixpoint every component is
    * uniformly labeled with its min id.
    * Returns (id, component) where component = min id reachable.
    *
    * Checkpoint mode: every round must TRUNCATE lineage (cache alone
    * leaves the logical plan nesting the previous round's — analysis
    * cost doubles per round, measured minutes of driver time by round
    * ~15; a checkpointed frame plans as a flat LogicalRDD). By default
    * that is `localCheckpoint` — executor-local storage, fine for one
    * JVM. On a real cluster executor loss makes a localCheckpoint'd
    * RDD unrecoverable (lineage is GONE), so production runs pass
    * `checkpointDir` (HDFS/object store) to use RELIABLE
    * `spark.checkpoint` storage instead.
    *
    * `maxRounds` bounds the loop: path halving converges in
    * O(log n) rounds, so the ceiling is generous — hitting it means
    * the input or engine is broken (e.g. nondeterministic ids) and
    * looping forever on a 1000-executor cluster is the worst failure
    * mode. Fails loudly rather than returning wrong labels. */
  /** Convergence decision for the exact-sum check: labels only ever
    * decrease, so equal consecutive sums ⟺ fixpoint. A null sum can
    * ONLY be decimal(38,0) overflow here (non-ANSI `sum` yields null
    * instead of throwing; emptiness is excluded before the loop) and
    * must throw — treating it as convergence would silently return
    * wrong components. Package-visible so the overflow path is
    * spec-testable without a 10^19-row input. */
  private[graft] def ccSumConverged(s: java.math.BigDecimal,
      prev: java.math.BigDecimal): Boolean = {
    if (s == null)
      throw new ArithmeticException(
        "connectedComponents: decimal(38,0) label-sum overflow — " +
          "convergence undecidable; use non-integral ids (join-based " +
          "check) or an ANSI session (which throws at the sum)")
    prev != null && s.compareTo(prev) == 0
  }

  def connectedComponents(pairs: DataFrame,
      checkpointDir: Option[String] = None,
      maxRounds: Int = 64,
      onRounds: Int => Unit = _ => ()): DataFrame = {
    val spark = pairs.sparkSession
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(true)
      case None => df => df.localCheckpoint(true)
    }
    val edges = ckpt(pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst"))))
    // Initial labels: min over the CLOSED neighborhood (id ∧ min
    // neighbor) — round 1's propagate step absorbed into the same
    // groupBy that would otherwise just enumerate the node set, at
    // identical shuffle cost. Dedup pair graphs are dominated by
    // 2-node components, which this already labels at fixpoint, so
    // seeding prevSum with the INITIAL sum lets the first loop round
    // declare convergence — one fewer (propagate + jump) round of
    // checkpointed joins in the common case.
    var labels = ckpt(edges.groupBy(col("src"))
      .agg(min(col("dst")).as("min_nbr"))
      .select(col("src").as("id"),
        least(col("src"), col("min_nbr")).as("label")))
    // Convergence check: labels only ever DECREASE (every update is a
    // least() against the previous value), so the exact label sum is
    // strictly decreasing until fixpoint — equal consecutive sums ⟺
    // no label changed. One narrow aggregation per round instead of a
    // self-join + count; at cluster scale that removes a whole shuffle
    // per round. INTEGRAL ids only: the decimal(38,0) cast the exact
    // sum needs would round fractional Float/Double labels, and a
    // sub-0.5 label decrease could then leave the rounded sum unchanged
    // — premature convergence with wrong components. Fractional and
    // non-numeric ids use the join check.
    val numericLabels = labels.schema("label").dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).collect()(0)
        .getDecimal(0)
    // Emptiness is decided ONCE, up front: an empty pair graph is
    // already at fixpoint. With this settled, a null sum INSIDE the
    // loop can only mean decimal(38,0) overflow under non-ANSI configs
    // (ids are non-null, so >=1 row always sums to a value) — which
    // throws instead of silently declaring premature convergence with
    // wrong components.
    if (labels.isEmpty) {
      onRounds(0)
      return labels.select(col("id"), col("label").as("component"))
    }
    // Seed the convergence baseline with the initial labels' sum:
    // monotone decrease means "round 1's sum equals the initial sum"
    // already proves fixpoint (possible because init is neighborhood-
    // min, not identity — an identity init always changes in round 1).
    var prevSum: java.math.BigDecimal =
      if (numericLabels) labelSum(labels) else null
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds rounds " +
            "(path halving converges in O(log n); input ids unstable?)")
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      val prop = ckpt(labels.select(col("id"), col("label"))
        .join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label")))
      // path halving: follow the label pointer one hop — the jump
      // distance roughly doubles per round, so a path of length n
      // collapses in O(log n) rounds
      val jumped = ckpt(prop.join(
          prop.select(col("id").as("lid"), col("label").as("llabel")),
          col("label") === col("lid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("llabel"), col("label")))
            .as("label")))
      if (numericLabels) {
        val s = labelSum(jumped)
        converged = Dedup.ccSumConverged(s, prevSum)
        prevSum = s
      } else {
        converged = jumped.select(col("id"), col("label").as("nl"))
          .join(labels.select(col("id"), col("label").as("ol")), "id")
          .filter(col("nl") =!= col("ol")).count() == 0
      }
      labels = jumped
    }
    // round-count witness for scale specs: path halving must stay
    // O(log n) — a linear round count at 10^5 nodes would be a 10^5x
    // job-count blowup at corpus scale
    onRounds(round)
    labels.select(col("id"), col("label").as("component"))
  }

  /** Composed dedup with a CONNECTED-COMPONENTS keeper — the production
    * shape: the verified-pair graph is clustered and exactly one doc
    * (the min id) survives per component, so transitive chains
    * A~B~C collapse to A even when (A,C) was never a candidate. */
  def dedupPipelineCcKept(df: DataFrame, id: Column, text: Column,
      n: Int = 3, jaccardThreshold: Double = 0.8,
      maxBandBucket: Int = DefaultMaxBandBucket,
      onDroppedBuckets: Long => Unit = null): DataFrame = {
    val (survivors, verified) = dedupSurvivorsAndVerified(
      df, id, text, n, jaccardThreshold, maxBandBucket, onDroppedBuckets)
    ccKeptFrom(survivors, verified)
  }

  /** SimHash sketch: 64-bit majority-vote over token hash bits.
    * bit i of the sketch = 1 iff more tokens have bit i set than not
    * (ties -> 1, since +0 >= 0). Near-duplicate docs differ in few
    * bits. One groupBy over exploded tokens; integer math only.
    *
    * 64 bits (not 32): at 10^10-document scale a 32-bit sketch
    * birthday-collides unrelated docs into shared sketches; 64 bits
    * keeps the collision expectation negligible. The two 32-bit hash
    * words come from ONE md5 per token ([[TextFunctions.hash32]] +
    * [[TextFunctions.hash32b]]), so the wider sketch costs no extra
    * hashing. Bit 63's weight is assembled by adding Long.MinValue
    * AFTER the non-negative 0..62 sum — an order in which no
    * intermediate overflows, so an overflow-checking engine (the
    * DuckDB oracle) computes the identical bit pattern. */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val tok = df.select(id.as("id"), text.as("text")).repartition(p)
      .select(col("id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .withColumn("h1", TextFunctions.hash32(col("tok")))
      .withColumn("h2", TextFunctions.hash32b(col("tok")))
    def bitOf(i: Int): Column =
      if (i < 32) shiftright(col("h1"), i).bitwiseAND(1)
      else shiftright(col("h2"), i - 32).bitwiseAND(1)
    val bitVotes = (0 until 64).map { i =>
      sum(when(bitOf(i) === 1, 1).otherwise(-1)).as(s"v_$i")
    }
    val voted = tok.groupBy(col("id")).agg(bitVotes.head, bitVotes.tail: _*)
    val low = (0 until 63).map { i =>
      when(col(s"v_$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sketch = low + when(col("v_63") >= 0, lit(Long.MinValue))
      .otherwise(lit(0L))
    voted.select(col("id"), sketch.as("simhash"))
  }

  /** Substring/passage-level exact dedup: find every maximal span of
    * text whose fixed-length character grams ALL occur at least
    * `minFreq` times corpus-wide (counting same-doc repeats) — the
    * distributed shape of suffix-array substring dedup ("Deduplicating
    * Training Data Makes Language Models Better": remove repeated
    * sequences of >= k tokens, not just whole near-dup documents).
    * A repeated passage of length >= `gramChars` appears as a RUN of
    * consecutive duplicated gram positions; stitching runs whose
    * starts are <= `gramChars` apart reconstructs the maximal repeated
    * span exactly, because consecutive grams overlap in
    * `gramChars - 1` characters.
    *
    * Three stages, each one shuffle, none quadratic:
    *  1. gram emission — per doc, position `p` in `1..len-L+1` emits
    *     `(md5(substring(text, p, L)), doc, p)`; output is
    *     O(total characters), the same blowup the suffix-array build
    *     pays, and the per-position md5 stays inside whole-stage
    *     codegen (no lambda — `explode` over a `sequence`, then a
    *     scalar projection).
    *  2. corpus gram frequency — `groupBy(gram)` count (map-side
    *     partial combine) with the `minFreq` floor, then a JOIN back
    *     on the gram key rather than a `collect_list` re-explode, so a
    *     degenerate ultra-frequent gram (a run of spaces corpus-wide)
    *     costs a skewed-join row spread, never one giant in-memory
    *     group; AQE's skew split handles the spread at scale.
    *  3. span stitching — per doc, sort duplicated positions (window
    *     on the doc key: the per-doc state is bounded by doc length)
    *     and break an island when the gap between consecutive
    *     duplicated starts exceeds `gramChars`.
    *
    * Output: (doc_id, span_start, span_end, n_gram_hits), 1-based
    * inclusive character offsets, `span_end - span_start + 1 >=
    * gramChars`. Downstream removal is a substring splice on these
    * offsets; the gate hashes the spans themselves.
    *
    * md5 (not a faster non-portable hash) keeps the gram keys
    * reproducible in the DuckDB oracle; a production deployment at
    * 100 TB would swap stage 1's hash for xxhash64 behind the same
    * algebra. Reference scope note: the reference pipeline
    * (`M/main.py`) carries no content dedup at all — this operator is
    * part of the extended training-data surface. */
  /** Doc-level decision rule on top of [[repeatedSpans]]: per-doc
    * duplicated-character coverage (spans never overlap after
    * stitching, so their lengths sum exactly) and a keep/drop verdict
    * at `maxCoverage` — the operational form substring dedup usually
    * takes at corpus scale (drop documents that are MOSTLY repeated
    * content; span splicing is reserved for surgical pipelines).
    * Docs with no duplicated span keep coverage 0 via the left join.
    * One extra hash aggregate + one broadcast-sized join over the
    * span frame; the corpus is touched once more only for doc_id +
    * length. */
  def repeatedSpanCoverage(df: DataFrame, id: Column, text: Column,
      gramChars: Int = 40, minFreq: Int = 2,
      maxCoverage: Double = 0.5): DataFrame =
    repeatedSpanCoverageFromSpans(df, id, text,
      repeatedSpans(df, id, text, gramChars, minFreq), maxCoverage)

  /** [[repeatedSpanCoverage]] over a prebuilt span frame
    * ([[repeatedSpans]] output) — the shared-tier entry point: five
    * gates consume the coverage verdict at the same gram constants,
    * so the expensive per-position gram pass persists once
    * (`ExtQueries.spanFrames`) and each consumer runs only this
    * aggregate + join over it. Output is byte-identical to the
    * composed form (same span frame, same algebra). */
  def repeatedSpanCoverageFromSpans(df: DataFrame, id: Column,
      text: Column, spans: DataFrame,
      maxCoverage: Double = 0.5): DataFrame = {
    require(maxCoverage > 0 && maxCoverage <= 1, "0 < maxCoverage <= 1")
    val dupChars = spans.groupBy(col("doc_id"))
      .agg(sum(col("span_end") - col("span_start") + 1).as("dup_chars"))
    df.select(id.as("doc_id"), length(text).cast("long").as("n_chars"))
      .join(dupChars, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
      .withColumn("dup_coverage",
        when(col("n_chars") === 0, lit(0.0)) // pin 0/0 on both engines
          .otherwise(col("dup_chars").cast("double") /
            col("n_chars").cast("double")))
      .withColumn("keep", col("dup_coverage") <= maxCoverage)
  }

  /** SURGICAL span splice — the removal step [[repeatedSpans]]'
    * scaladoc promises: rebuild each document with its repeated spans
    * cut out exactly. Spans are disjoint and non-adjacent after
    * stitching, so the clean text is the ordered concatenation of the
    * complement gaps: each span contributes the gap ending just
    * before it (lag window per doc), plus one tail gap after the last
    * span; docs with no spans pass through unchanged, fully-covered
    * docs become "". One window + one ordered per-doc concat over the
    * SPAN frame (bounded by span count, not corpus size); the corpus
    * is touched once more only for text + length. Output (doc_id,
    * n_spans, removed_chars, clean_text). */
  def spliceRepeatedSpans(df: DataFrame, id: Column, text: Column,
      gramChars: Int = 40, minFreq: Int = 2): DataFrame =
    spliceRepeatedSpansFromSpans(df, id, text,
      repeatedSpans(df, id, text, gramChars, minFreq))

  /** [[spliceRepeatedSpans]] over a prebuilt span frame — the
    * shared-tier entry point (see [[repeatedSpanCoverageFromSpans]]).
    * Byte-identical output: the splice is pure algebra over the span
    * frame + one more corpus touch for text/length. */
  def spliceRepeatedSpansFromSpans(df: DataFrame, id: Column,
      text: Column, spansIn: DataFrame): DataFrame = {
    val docs = df.select(id.as("doc_id"), text.as("text"),
      length(text).cast("long").as("len"))
    val spans = graft.Tables.materialize(
      spansIn.select(col("doc_id"), col("span_start"), col("span_end")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
    val mid = spans
      .withColumn("gs",
        coalesce(lag(col("span_end"), 1).over(w), lit(0L)) + 1)
      .withColumn("ge", col("span_start") - 1)
      .select(col("doc_id"), col("gs"), col("ge"))
    val tail = spans.groupBy(col("doc_id"))
      .agg(max(col("span_end")).as("le"))
      .join(docs.select(col("doc_id"), col("len")), "doc_id")
      .select(col("doc_id"), (col("le") + 1).as("gs"),
        col("len").as("ge"))
    val rebuilt = mid.unionByName(tail)
      .filter(col("ge") >= col("gs"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("gs"),
        expr("substr(text, CAST(gs AS INT), CAST(ge - gs + 1 AS INT))")
          .as("piece"))
      .groupBy(col("doc_id"))
      .agg(concat_ws("", transform(
        sort_array(collect_list(struct(col("gs"), col("piece")))),
        s => s.getField("piece"))).as("clean_text"))
    val stats = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1)
          .as("removed_chars"))
    docs.select(col("doc_id"), col("text"))
      .join(stats, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        when(col("n_spans").isNull, col("text"))
          .otherwise(coalesce(col("clean_text"), lit("")))
          .as("clean_text"))
  }

  def repeatedSpans(df: DataFrame, id: Column, text: Column,
      gramChars: Int = 40, minFreq: Int = 2): DataFrame = {
    require(gramChars >= 2, s"gramChars must be >= 2, got $gramChars")
    require(minFreq >= 2, s"minFreq must be >= 2, got $minFreq")
    val p = df.sparkSession.sparkContext.defaultParallelism
    val base = df.select(id.as("doc_id"), text.as("text"))
      .filter(length(col("text")) >= gramChars)
      .repartition(p)
    // materialized: the gram frame feeds both the frequency pass and
    // the join-back — without the cache every position's md5 would be
    // computed twice (measured ~2x the stage cost at sf0.1); a 100 TB
    // run checkpoints this frame to storage instead
    val grams = graft.Tables.materialize(base
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (gramChars - 1)))
          .as("p"))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        md5(expr(s"substring(text, p, $gramChars)")).as("g")))
    val dupGrams = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("gf"))
      .filter(col("gf") >= minFreq)
      .select(col("g"))
    val dupPos = grams.join(dupGrams, "g").select(col("doc_id"), col("p"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p").asc)
    dupPos
      .withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(w) <= gramChars, 0)
          .otherwise(1))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + (gramChars - 1)).as("span_end"),
        count(lit(1)).as("n_gram_hits"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_gram_hits"))
  }

  /** Winnowing document fingerprints (the Schleimer–Wilkerson–Aiken /
    * MOSS local algorithm): token k-gram hashes slide under a window
    * of `w` consecutive grams; each full window contributes its
    * minimal hash with ties broken RIGHTMOST (the paper's rule), and
    * the distinct selected (position, hash) pairs are the document's
    * fingerprint set. Guarantee: any shared token run of at least
    * `w + k - 1` tokens between two documents yields at least one
    * shared fingerprint, at an expected density of ~2/(w+1)
    * fingerprints per gram — the recall/bandwidth dial that sets
    * winnowing apart from [[minhashSignatures]] (which sketches the
    * WHOLE document and cannot localize the match).
    *
    * Shape: positional grams from one generator (no distinct — order
    * matters here, unlike [[shingles]]), then a per-doc ROWS window
    * min. Everything partitions by doc_id, so at 100 TB the pass is
    * embarrassingly parallel; no cross-doc shuffle exists until a
    * downstream join ON fp_hash. The rightmost tie-break is encoded
    * arithmetically — combined = h·2²⁰ + (2²⁰ − p), so equal hashes
    * order by LATER position first — keeping the window min a plain
    * long comparison (codegen-friendly, no struct comparator); the
    * decode back to (position, hash) is two bit ops. Positions are
    * bounded by 2²⁰ grams/doc (1M tokens — far above any sane
    * document; chunk first otherwise). md5-derived
    * [[TextFunctions.hash32]] keeps hashes portable to the DuckDB
    * oracle; production would swap xxhash64 behind the same algebra.
    *
    * Output: (doc_id, fp_pos — 1-based gram index, fp_hash).
    * Documents with fewer than `w + k - 1` tokens emit nothing (no
    * full window exists); callers wanting short docs represented
    * fall back to [[TextFunctions.canonicalFingerprint]]. */
  def winnowFingerprints(df: DataFrame, id: Column, text: Column,
      k: Int = 3, w: Int = 4): DataFrame =
    winnowFingerprintsFromToks(tokenize(df, id, text), k, w)

  /** [[winnowFingerprints]] over a prepared (id, toks) frame from
    * [[tokenize]] — the multi-k-audit entry point. */
  def winnowFingerprintsFromToks(tokedIn: DataFrame,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val M = 1L << 20
    val toked = tokedIn.select(col("id").as("doc_id"), col("toks"))
    val grams = when(size(col("toks")) >= k,
      transform(sequence(lit(1), size(col("toks")) - (k - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
      .otherwise(array())
    val posed = toked.select(col("doc_id"), posexplode(grams))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        TextFunctions.hash32(col("col")).as("h"))
      .withColumn("c", col("h") * M + (lit(M) - col("p")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("p").asc)
      .rowsBetween(Window.currentRow, w - 1)
    val whole = Window.partitionBy(col("doc_id"))
    posed
      .withColumn("m", count(lit(1)).over(whole))
      .withColumn("sel", min(col("c")).over(win))
      .filter(col("p") <= col("m") - (w - 1))
      .select(col("doc_id"),
        (lit(M) - col("sel").bitwiseAND(lit(M - 1))).as("fp_pos"),
        shiftright(col("sel"), 20).as("fp_hash"))
      .distinct()
  }

  /** Localized near-dup candidate pairs from shared winnowing
    * fingerprints ([[winnowFingerprints]]) — the join that makes the
    * fingerprint set an index: docs sharing ≥ `minShared` selected
    * hashes are candidates, with the shared count as the match
    * strength. Because winnowing guarantees a fingerprint inside
    * every w+k−1-token run, this catches PARTIAL overlaps (one
    * copied paragraph in an otherwise-unrelated doc) that whole-doc
    * MinHash dilutes below its Jaccard threshold — the plagiarism /
    * quote-detection shape, complementing [[minhashLshPairs]].
    *
    * Scale: identical discipline to the LSH band join — fingerprints
    * with document frequency > `maxDf` are dropped before the
    * self-join (a fingerprint shared by thousands of docs is
    * boilerplate, not evidence, and its bucket alone would emit
    * df²/2 pairs), so per-key fan-out is capped at maxDf²/2 and the
    * join is one co-partitioned shuffle on fp_hash. Dropped-hot
    * fingerprints are observable via [[winnowFingerprints]] minus
    * this frame's keys. */
  /** Exact LONGEST SHARED TOKEN RUN per candidate pair — the
    * suffix-array-style verification run only on pairs a sketch
    * already surfaced: token-position matches between the two docs,
    * grouped by alignment offset pa − pb (the diagonal); consecutive
    * pa within one diagonal form a shared run, so the max island size
    * is the exact LCS run length in tokens. Corpus contributes only
    * the PAIRED docs' positions (semi-join); the islands window
    * partitions by (pair, diagonal) — state bounded by doc length.
    * All integers. Returns (id_a, id_b, lcs_run). */
  def longestSharedRuns(pairs: DataFrame, docs: DataFrame, id: Column,
      text: Column): DataFrame = {
    val ids = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val pos = graft.Tables.materialize(
      docs.select(id.as("doc_id"), text.as("text"))
        .join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text")))
            .as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
          col("tok")))
    pairs.select(col("id_a"), col("id_b"))
      .join(pos.select(col("doc_id").as("id_a"), col("p").as("pa"),
        col("tok")), "id_a")
      .join(pos.select(col("doc_id").as("id_b"), col("p").as("pb"),
        col("tok")), Seq("id_b", "tok"))
      .select(col("id_a"), col("id_b"), col("pa"),
        (col("pa") - col("pb")).as("d"))
      .withColumn("g", col("pa") - row_number().over(
        Window.partitionBy(col("id_a"), col("id_b"), col("d"))
          .orderBy(col("pa").asc)))
      .groupBy(col("id_a"), col("id_b"), col("d"), col("g"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("run")).as("lcs_run"))
  }

  def winnowPairs(df: DataFrame, id: Column, text: Column,
      k: Int = 3, w: Int = 4, maxDf: Int = 64,
      minShared: Int = 2): DataFrame =
    winnowPairsFromToks(tokenize(df, id, text), k, w, maxDf, minShared)

  /** [[winnowPairs]] over a prepared (id, toks) frame. */
  def winnowPairsFromToks(toked: DataFrame,
      k: Int = 3, w: Int = 4, maxDf: Int = 64,
      minShared: Int = 2): DataFrame = {
    require(maxDf >= 2 && minShared >= 1, "maxDf >= 2, minShared >= 1")
    val fp = winnowFingerprintsFromToks(toked, k, w)
      .select(col("doc_id"), col("fp_hash")).distinct()
    val keep = fp.groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("fdf"))
      .filter(col("fdf") >= 2 && col("fdf") <= maxDf)
      .select(col("fp_hash"))
    val filtered = fp.join(keep, "fp_hash")
    val a = filtered.select(col("fp_hash"), col("doc_id").as("id_a"))
    val b = filtered.select(col("fp_hash"), col("doc_id").as("id_b"))
    a.join(b, "fp_hash")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Cross-release corpus diff: classify every INCOMING document
    * against the STANDING corpus as `exact` (byte-identical content
    * already present), `near` (n-gram Jaccard ≥ `threshold` to some
    * standing doc), or `new`. The ops report behind accepting a crawl
    * delta: how much of the new release is actually new.
    *
    * Shape: the exact tier is one semi-join on content fingerprints;
    * the near tier is a CROSS-SET gram join (standing grams × incoming
    * grams — never standing×standing, so absorbing a small delta
    * against a huge standing corpus costs |delta|-proportional
    * candidates). At 100 TB the cross-set join runs behind the same
    * prefix-filter/LSH candidate generators as [[ngramJaccardPairs]] /
    * [[incrementalLshDedup]]; the exact gram intersection here is the
    * verification-grade tier, applied to the delta only. Output:
    * (id, class) for incoming docs. */
  def releaseDiff(docs: DataFrame, id: Column, text: Column,
      incomingPred: Column, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val base = graft.Tables.materialize(
      docs.select(id.as("id"), text.as("text"), incomingPred.as("inc")))
    val g = graft.Tables.materialize(
      shingles(base, col("id"), col("text"), n)
        .join(base.select(col("id"), col("inc")), "id"))
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = g.filter(!col("inc"))
      .select(col("id").as("sid"), col("gram"))
      .join(g.filter(col("inc")).select(col("id").as("iid"), col("gram")),
        "gram")
      .groupBy(col("sid"), col("iid")).agg(count(lit(1)).as("inter"))
    val near = inter
      .join(sizes.select(col("id").as("sid"), col("sz").as("sz1")), "sid")
      .join(sizes.select(col("id").as("iid"), col("sz").as("sz2")), "iid")
      .filter(col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")).cast("double")
        >= threshold)
      .select(col("iid").as("id")).distinct()
      .withColumn("is_near", lit(1L))
    val standingFp = base.filter(!col("inc"))
      .select(md5(col("text")).as("fp")).distinct()
      .withColumn("is_exact", lit(1L))
    base.filter(col("inc"))
      .select(col("id"), md5(col("text")).as("fp"))
      .join(standingFp, Seq("fp"), "left_outer")
      .join(near, Seq("id"), "left_outer")
      .select(col("id"),
        when(col("is_exact") === 1, "exact")
          .when(col("is_near") === 1, "near")
          .otherwise("new").as("class"))
  }
}
