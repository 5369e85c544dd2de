package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs around the dedup/similarity family: latest-record compaction,
  * deterministic sampling (uniform, stratified, sharded) and
  * vocabulary / TF-IDF construction. Extends the reference engine the
  * same way `ext.Dedup` / `ext.Similarity` do — the reference
  * (`M/main_batch.py`) stops at per-row mapping, these are the
  * corpus-level passes run before/after it.
  *
  * Determinism rules shared by every operator here:
  *  - randomness is always a cryptographic hash of row CONTENT
  *    (md5), never `rand()` — results are reproducible across runs,
  *    partitionings and engines, and re-running on an appended table
  *    keeps prior decisions stable (critical for incremental corpus
  *    builds);
  *  - every window is totally ordered (hash, then key) so ties cannot
  *    flip between runs;
  *  - no driver-side state: every operator is a constant number of
  *    shuffles independent of data size.
  */
object Corpus {

  /** Hex digit at `pos` (1-based) of hash `h` -> 0..15, via a 1-based
    * `instr` over the hex alphabet — portable across engines (DuckDB
    * `instr` agrees byte-for-byte; it has no `conv`). Spark's Scala
    * `instr(Column, String)` takes only a literal needle, so the
    * column-needle form goes through `call_function`. */
  private def hexDigitVal(h: Column, pos: Int): Column =
    call_function("instr", lit("0123456789abcdef"), substring(h, pos, 1)) -
      lit(1)

  // ------------------------------------------------------- compaction

  /** Latest-record-per-key compaction (the "keep newest version"
    * pass over an append-only corpus — CDC collapse, re-crawl dedup,
    * upsert materialization).
    *
    * `orderCols` must totally order rows WITHIN a key (append a
    * unique id as the last column); the winner is the max in that
    * order. Runs as one hash aggregation over `max(struct(order...,
    * payload...))` — a single key shuffle with map-side partial
    * aggregation, no window sort. At 100 TB this is the shape you
    * want: the map side reduces every key to one candidate row per
    * partition before anything moves.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String])
      : DataFrame = {
    val payload = df.columns.filterNot(c => keyCols.contains(c))
    // order columns first => struct comparison is (order..., rest...);
    // orderCols totally order within key, so the tail never decides.
    val packed = struct(
      (orderCols ++ payload.filterNot(orderCols.contains)).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("_latest"))
      .select(keyCols.map(col) ++
        payload.map(c => col(s"_latest.$c").as(c)): _*)
  }

  // -------------------------------------------------------- sampling

  /** Deterministic uniform sample: keep a row iff the first hex digit
    * of `md5(key)` is < `sixteenths` (fraction = sixteenths/16).
    * Pure per-row filter — no shuffle, prunes at the scan when the
    * key is a stored column, and the SAME rows are kept on any
    * engine, any partitioning, any run (unlike `df.sample`, which is
    * seed- and partitioning-dependent). */
  def hashSample(df: DataFrame, key: Column, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16, "sixteenths in [0,16]")
    df.filter(hexDigitVal(md5(key.cast("string")), 1) < lit(sixteenths))
  }

  /** Deterministic stratified quota sample: at most `quota` rows per
    * stratum, chosen by hash order (so the per-stratum choice is a
    * uniform sample, stable across runs/engines). One shuffle on the
    * stratum key + per-stratum sort.
    *
    * 100 TB note: a giant stratum serializes into one task's sort.
    * For quotas much smaller than strata (the common corpus-balancing
    * case) pre-filter with [[hashSample]] at ~2x the target rate
    * first so the window only ranks a sliver; the quota cut stays
    * exact because hash order is preserved. */
  def stratifiedQuota(df: DataFrame, stratum: Column, key: Column, quota: Int)
      : DataFrame = {
    val h = md5(key.cast("string"))
    val w = Window.partitionBy(stratum).orderBy(h.asc, key.asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= quota)
      .drop("_rk")
  }

  /** Deterministic weighted sampling: keep a row iff
    * `hash32(key) < clamp(weight,0,1) · 2³²` — each row kept with
    * probability equal to its weight, but DETERMINISTICALLY (same
    * content ⇒ same decision on any engine/partitioning/run, and
    * appended corpus batches never flip prior decisions). The
    * quality-weighted corpus downsample: feed a quality score as the
    * weight and high-quality documents survive proportionally more
    * often. Pure per-row filter — no shuffle. The comparison is
    * long-vs-double with both sides exact (hash < 2³² is exact in a
    * double; the product is one correctly-rounded IEEE multiply), so
    * engines agree bit-for-bit. */
  def weightedSample(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val w = least(greatest(weight, lit(0.0)), lit(1.0))
    df.filter(
      graft.functions.TextFunctions.hash32(key.cast("string"))
        .cast("double") < w * lit(4294967296.0))
  }

  /** Deterministic mixture sampling: per-stratum keep rates (the
    * domain-mixing step of training-data prep — oversample curated
    * sources, downsample bulk crawl). `rates` maps stratum value →
    * rate in [0,1]; unlisted strata use `defaultRate`. Compiles to a
    * literal when-chain over the stratum column + one hash compare —
    * per-row, shuffle-free, broadcast-free. */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates in [0,1]")
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((s, r), els) => when(stratum === s, lit(r)).otherwise(els)
    }
    weightedSample(df, key, rate)
  }

  /** Deterministic train/val/test assignment: hash32(key)/2³² lands
    * in [0, train) → "train", [train, train+val) → "val", else
    * "test". Content-addressed like every sampler here — the same
    * document NEVER migrates between splits across runs, appends, or
    * engines (the property that keeps eval sets uncontaminated as the
    * corpus grows; a `rand()` split re-deals on every addition). The
    * two thresholds are exact in doubles (hash < 2³² is exact; one
    * IEEE multiply each), so engines agree bit-for-bit. Pure per-row
    * projection — no shuffle. */
  def datasetSplit(df: DataFrame, key: Column,
      trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      "fractions must be non-negative and sum to at most 1")
    val h = graft.functions.TextFunctions.hash32(key.cast("string"))
      .cast("double")
    df.withColumn("split",
      when(h < lit(trainFrac) * lit(4294967296.0), "train")
        .when(h < lit(trainFrac + valFrac) * lit(4294967296.0), "val")
        .otherwise("test"))
  }

  /** Deterministic shard assignment + intra-shard position — the
    * "global shuffle then write N shards" step of training-data prep,
    * expressed so the shuffle is reproducible: shard = first eight hex
    * digits of md5(key) (32 bits — so the worst-case shard imbalance
    * is 1 part in 2^32/nShards, vs the 1-in-few-percent systematic
    * skew a 256-cell hash gives any nShards that doesn't divide 256)
    * mod `nShards`, position = rank within the shard by (hash, key).
    * Reading shards in position order replays one fixed
    * content-derived permutation of the corpus.
    *
    * One shuffle (on the shard id) + per-shard sort. Positions are
    * per-shard, so no global total order is materialized — at 100 TB
    * each shard sorts independently; pair with
    * `repartition(col("shard")).sortWithinPartitions("pos")` to lay
    * files out for sequential training reads. */
  def shardAssign(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 65536, "nShards in [1,65536]")
    val h = md5(key.cast("string"))
    // conv() parses the 8-digit hex prefix as an unsigned 32-bit value;
    // DuckDB's portable twin is ('0x' || substr(h,1,8))::BIGINT
    val shard = pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
      lit(nShards)).cast("long")
    val w = Window.partitionBy(col("_shard")).orderBy(col("_h").asc, key.asc)
    df.withColumn("_h", h).withColumn("_shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("shard", col("_shard"))
      .drop("_h", "_shard")
  }

  /** Deterministic GLOBAL training-shuffle rank — the total-order
    * complement of [[shardAssign]]: every row gets its exact position
    * 0..n-1 in the corpus-wide pseudo-random order (md5 of the key,
    * ties broken by the key itself), without a global window.
    *
    * This is the "shuffle the whole corpus once, then read
    * sequentially" export step of a training run. A
    * `row_number() OVER (ORDER BY hash)` plans a single-partition
    * sort at 100 TB; instead:
    *   1. range-repartition on (hash, key) + sort within partitions —
    *      the only data-sized shuffle, and it's the one a sorted
    *      export needs anyway;
    *   2. `monotonically_increasing_id` over the SORTED partitions
    *      encodes (partitionId, localIndex) in one narrow map;
    *   3. per-partition row counts (numPartitions rows — a bounded
    *      driver collect) prefix-sum into partition offsets;
    *   4. rank = offset(partition) + localIndex via one broadcast join.
    * The frame is materialized between (2) and (3) so both jobs see
    * identical range boundaries; the rank itself is boundary-
    * independent (offsets absorb wherever the sampler cut), so the
    * output is bit-stable across runs and engines.
    *
    * Returns (key as `id`, `shuffle_pos`). */
  def shuffleRank(df: DataFrame, key: Column,
      numPartitions: Int = 32): DataFrame = {
    val keyed = df.select(key.as("id"),
      md5(concat(lit("shuf|"), key.cast("string"))).as("_h"))
    globalOrderRank(keyed, numPartitions, col("_h"), col("id"))
      .select(col("id"), col("_rank").as("shuffle_pos"))
  }

  /** Global 0-based rank of every row under the total order given by
    * `sortCols` (which MUST include a unique tiebreaker), without a
    * single-partition sort — the distributed machinery behind
    * [[shuffleRank]] and [[curriculumOrder]]:
    *   1. range-repartition + sort-within-partitions on `sortCols` —
    *      the only data-sized shuffle;
    *   2. `monotonically_increasing_id` over the sorted partitions
    *      encodes (partitionId, localIndex) in one narrow map;
    *   3. per-partition counts (numPartitions rows — bounded driver
    *      collect) prefix-sum into partition offsets;
    *   4. rank = offset(partition) + localIndex via broadcast join.
    * The frame is materialized between (2) and (3) so both jobs see
    * identical range boundaries; the rank itself is boundary-
    * independent (offsets absorb wherever the sampler cut), so the
    * output is bit-stable across runs and engines. Returns the input
    * columns plus `_rank`. */
  def globalOrderRank(df: DataFrame, numPartitions: Int,
      sortCols: Column*): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mono", monotonically_increasing_id())
    val m = graft.Tables.materialize(sorted)
    // monotonically_increasing_id layout: partition id << 33 | local idx
    val withPid = m
      .withColumn("_pid", shiftright(col("_mono"), 33))
      .withColumn("_lidx", col("_mono").bitwiseAND(lit((1L << 33) - 1)))
    val counts = withPid.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .collect() // bounded: one row per partition
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offsetDf = df.sparkSession
      .createDataFrame(offsets.toSeq).toDF("_pid", "_off")
    withPid.join(broadcast(offsetDf), Seq("_pid"))
      .withColumn("_rank", col("_off") + col("_lidx"))
      .drop("_mono", "_pid", "_lidx")
  }

  /** Curriculum training order: documents bucketed into quartiles of
    * a difficulty proxy (token count — short docs first), then given
    * a corpus-wide position that walks the buckets easy→hard with a
    * deterministic hash shuffle INSIDE each bucket. This is the
    * "sort by difficulty, shuffle within stage" export order
    * curriculum-learning recipes prescribe; emitting an explicit
    * position makes the order replayable and resumable.
    *
    * Quartile cut points come from one `percentile_disc` aggregate
    * (3 scalars broadcast back — no per-row window), bucket
    * assignment is three integer compares, and the global position is
    * [[globalOrderRank]]'s range-partition + offset machinery over
    * (bucket, md5, id) — no single-partition sort anywhere, so the
    * plan survives 100 TB exactly like [[shuffleRank]]'s. One
    * caveat at that scale: `percentile_disc` is exact and therefore
    * holds its input on the final reducer — swap the cut computation
    * to `approx_percentile` (mergeable t-digest, same 3 broadcast
    * scalars) once the corpus outgrows a single executor's memory;
    * the bucket walk and rank machinery are unchanged.
    *
    * Returns (id, n_tokens, bucket 1..4, curriculum_pos). */
  def curriculumOrder(df: DataFrame, id: Column, text: Column,
      numPartitions: Int = 32): DataFrame = {
    val scored = df.select(id.as("id"),
      TextFunctions.tokenCount(text).as("n_tokens"),
      md5(concat(lit("cur|"), id.cast("string"))).as("_h"))
    val cuts = scored.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens)")
        .as("_c1"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)")
        .as("_c2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tokens)")
        .as("_c3"))
    val bucketed = scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        (lit(1) + (col("n_tokens") > col("_c1")).cast("int")
          + (col("n_tokens") > col("_c2")).cast("int")
          + (col("n_tokens") > col("_c3")).cast("int")).cast("long"))
      .drop("_c1", "_c2", "_c3")
    globalOrderRank(bucketed, numPartitions,
        col("bucket"), col("_h"), col("id"))
      .select(col("id"), col("n_tokens").cast("long").as("n_tokens"),
        col("bucket"), col("_rank").as("curriculum_pos"))
  }

  // -------------------------------------------- chunking / packing

  /** Sliding-window token chunks: each document's whitespace tokens
    * split into windows of `chunkSize` tokens starting every `stride`
    * tokens (stride < chunkSize ⇒ overlapping context windows, the
    * standard LLM pre-training chunking shape). The final windows may
    * be shorter than `chunkSize`; documents with zero tokens produce
    * zero chunks.
    *
    * Pure per-row array expressions + one generator — no shuffle at
    * all: at 100 TB this runs entirely map-side at scan parallelism,
    * and the output (≈ tokens/stride rows per doc) streams straight
    * into the next stage or a shard writer. Tokenization is the
    * single-space split shared with [[vocabTopK]] so results are
    * byte-identical across engines. */
  def chunkTokens(df: DataFrame, id: Column, text: Column,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, "chunkSize >= 1")
    require(stride >= 1, "stride >= 1")
    val toked = df
      .select(id.as("doc_id"),
        filter(split(text, " "), t => t =!= "").as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") > 0)
    toked
      .select(col("doc_id"), col("_toks"), col("_n"),
        posexplode(sequence(lit(1), col("_n"), lit(stride)))
          .as(Seq("_idx", "_start")))
      .select(col("doc_id"),
        col("_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_toks"), col("_start"), lit(chunkSize)))
          .as("chunk"),
        least(lit(chunkSize), col("_n") - col("_start") + 1).cast("long")
          .as("n_tokens"))
  }

  /** Token-budget sequence packing — the "concatenate the corpus and
    * cut every `budget` tokens" step that turns documents into
    * fixed-length training sequences. Documents are laid out in a
    * deterministic content-hash order inside `nShards` independent
    * shards; each document gets its starting token `offset` within
    * its shard (exclusive prefix sum) and the range of training
    * sequences it lands in: `seq_first = offset div budget`,
    * `seq_last = (offset + n_tokens - 1) div budget` (a document
    * straddling a cut belongs to both — the reader duplicates the
    * boundary doc, exactly like block-packed pre-training data).
    *
    * Scale shape: one shuffle on the shard id plus a per-shard window
    * prefix sum — no global sort, no driver state. Shards are
    * content-hash balanced (32 hash bits), so at 100 TB each of the
    * `nShards` prefix sums is an independent, evenly-sized task
    * chain; sequence ids are per-shard (global id = (shard, seq)).
    * Zero-token documents are dropped (they occupy no tokens). */
  def packSequences(df: DataFrame, id: Column, text: Column,
      budget: Int, nShards: Int): DataFrame = {
    require(budget >= 1, "budget >= 1")
    require(nShards >= 1 && nShards <= 65536, "nShards in [1,65536]")
    val h = md5(id.cast("string"))
    val base = df
      .select(id.as("doc_id"), h.as("_h"),
        size(filter(split(text, " "), t => t =!= "")).cast("long")
          .as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard",
        pmod(conv(substring(col("_h"), 1, 8), 16, 10).cast("long"),
          lit(nShards)).cast("long"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"offset div $budget"))
      .withColumn("seq_last", expr(s"(offset + n_tokens - 1) div $budget"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("offset"),
        col("seq_first"), col("seq_last"))
  }

  // ------------------------------------------------- BPE encode

  /** Fixed merge table for the gated BPE encoder: rank-ordered,
    * derived from the corpus's own frequent character pairs. Every
    * pair has DISTINCT elements (a ≠ b) — that restriction makes
    * leftmost-exhaustive merging equal SIMULTANEOUS merging of all
    * occurrences (an occurrence can only overlap the next when the
    * pair is a doubled symbol), which is what keeps the operator
    * replayable in set-oriented SQL. Identical-symbol merges would
    * need the run-parity variant; real learned tables are
    * overwhelmingly a ≠ b. */
  val DefaultBpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("e", "r"), ("a", "n"), ("o", "r"),
    ("i", "n"), ("s", "t"), ("r", "e"), ("o", "n"), ("a", "t"),
    ("an", "d"), ("l", "e"))

  /** BPE merge APPLICATION to one word — the encode step
    * [[bpePairCounts]]' training loop was missing: start from the
    * word's characters and apply each merge of the fixed table in
    * rank order, each exhaustively left-to-right (the standard
    * iterative BPE encoder; a merge's output never re-forms an
    * earlier-rank pair, so one pass per rank is exact). Implemented
    * as `merges.length` chained `aggregate` folds — each fold either
    * replaces the accumulator's last symbol with the merged one or
    * appends, which handles overlapping occurrences of doubled
    * symbols correctly ("aaa" + (a,a) → [aa, a]). The whole chain is
    * ONE per-row expression: no shuffle, no state, and each step
    * references the previous exactly once, so the plan stays linear
    * in the table size. */
  def bpeEncodeWord(word: Column, merges: Seq[(String, String)]): Column = {
    var syms: Column = filter(split(word, ""), c => c =!= "")
    for ((a, b) <- merges) syms = bpeMergeStep(syms, a, b)
    syms
  }

  /** ONE merge rank applied exhaustively left-to-right to a
    * symbol-sequence column — the shared pass of [[bpeEncodeWord]]'s
    * fixed-table encode and [[bpeTrainState]]'s training loop. */
  def bpeMergeStep(syms: Column, a: String, b: String): Column = {
    val m = a + b
    aggregate(syms, typedlit(Seq.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
        .otherwise(concat(acc, array(x))))
  }

  /** BPE merge-table TRAINING — the iterated learner that closes the
    * tokenizer lifecycle over [[bpePairCounts]]' one-iteration
    * algebra: starting from each distinct word's characters, repeat
    * `rounds` times: count adjacent symbol pairs across the vocab
    * (each word's pairs weighted by its corpus frequency), merge the
    * argmax pair (ties n desc, then (lhs, rhs) ascending — a total
    * order), rewrite the vocab with [[bpeMergeStep]]. Only pairs with
    * DISTINCT symbols are candidates (the [[DefaultBpeMerges]]
    * restriction that makes every pass replayable in set-oriented
    * SQL; real learned tables are overwhelmingly a ≠ b).
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency
    * aggregate); every round runs on |vocab| rows — one
    * map-side-combined pair aggregate + a 1-row argmax (the classic
    * driver-bounded scalar, N rounds of one row each) + one per-row
    * rewrite, materialized per round so the plan stays constant-depth.
    *
    * Returns (merges, vocab): `merges` (round, lhs, rhs, merged, n)
    * is the learned table in application order; `vocab` (word, wf,
    * syms) is the trained word encoding under it — joining doc tokens
    * against `vocab` IS encoding with the learned tokenizer. */
  def bpeTrainState(docs: DataFrame, text: Column,
      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64, "rounds in [1,64]")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val words = tokens(docs, text)
      .groupBy(col("token")).agg(count(lit(1)).as("wf"))
    var vocab = graft.Tables.materialize(
      words.select(col("token").as("word"), col("wf"),
          filter(split(col("token"), ""), c => c =!= "").as("syms"))
        .repartition(p)) // single-file scans leave 1 partition
    val learned =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pick = vocab
        .select(col("wf"), explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("a"),
                element_at(col("syms"), i + 1).as("b"))))
          .otherwise(array())).as("pr"))
        .select(col("wf"), col("pr.a"), col("pr.b"))
        .filter(col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(sum(col("wf")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // bounded: ONE argmax row per round
      if (pick.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (pick(0).getString(0), pick(0).getString(1), pick(0).getLong(2))
        learned += ((r.toLong, a, b, a + b, n))
        vocab = graft.Tables.materialize(
          vocab.select(col("word"), col("wf"),
            bpeMergeStep(col("syms"), a, b).as("syms")))
        r += 1
      }
    }
    (learned.toSeq.toDF("round", "lhs", "rhs", "merged", "n"), vocab)
  }

  /** Learned-merge table only — see [[bpeTrainState]]. */
  def bpeTrain(docs: DataFrame, text: Column, rounds: Int): DataFrame =
    bpeTrainState(docs, text, rounds)._1

  /** Corpus BPE encode: every DISTINCT word is encoded once (the
    * classic trick — the expensive per-word fold runs |vocab| times,
    * not |corpus tokens| times; at 100 TB the distinct-word frame is
    * millions of rows against trillions of tokens), then docs join
    * their tokens back and flatten in document order. Output:
    * (doc_id, n_ws long, bpe array&lt;string&gt;) for docs with ≥ 1
    * token. One shuffle for the distinct, one broadcast-able join on
    * word, one doc-keyed aggregate. */
  def bpeEncodeDocs(docs: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame = {
    val toked = docs.select(id.as("doc_id"),
        filter(split(text, " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val encoded = graft.Tables.materialize(
      toked.select(explode(col("toks")).as("word")).distinct()
        .repartition(p) // single-file scans leave 1 partition; the
                        // fold chain is the expensive stage
        .select(col("word"), bpeEncodeWord(col("word"), merges).as("syms")))
    bpeEncodeDocsWithVocab(toked, encoded)
  }

  /** Encode against an EXISTING (word, syms) vocabulary frame — how
    * [[bpeTrainState]]'s trained vocab encodes the corpus without
    * re-running any fold: the trained frame IS the encoder. `toked`
    * is (doc_id, toks array) with ≥ 1 token per row. */
  def bpeEncodeDocsWithVocab(toked: DataFrame,
      vocab: DataFrame): DataFrame =
    toked
      .select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos", "word")))
      .join(vocab.select(col("word"), col("syms")), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws"),
        flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("syms")))),
          s => s.getField("syms"))).as("bpe"))

  /** [[packSequences]] with REAL tokenizer counts: identical layout
    * algebra (content-hash shards, per-shard exclusive prefix sum,
    * div-budget sequence spans) but `n_tokens` is the document's BPE
    * symbol count under `merges` instead of the whitespace
    * approximation — what an actual trainer's packer sees. The count
    * needs no doc-order flatten: it's the sum of per-token symbol
    * counts through the same distinct-word encode. */
  def packSequencesBpe(df: DataFrame, id: Column, text: Column,
      budget: Int, nShards: Int,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame =
    packSequencesFromCounts(
      bpeEncodeDocs(df, id, text, merges)
        .select(col("doc_id"), size(col("bpe")).cast("long").as("n_tokens")),
      budget, nShards)

  /** The packing LAYOUT over any (doc_id, n_tokens) count frame —
    * content-hash shards, per-shard exclusive prefix sum, div-budget
    * sequence spans; shared by the BPE and unigram packers so the
    * layout algebra cannot drift between tokenizer families. */
  def packSequencesFromCounts(counts: DataFrame,
      budget: Int, nShards: Int): DataFrame = {
    require(budget >= 1, "budget >= 1")
    require(nShards >= 1 && nShards <= 65536, "nShards in [1,65536]")
    val h = md5(col("doc_id").cast("string"))
    val base = counts
      .filter(col("n_tokens") > 0)
      .withColumn("_h", h)
      .withColumn("shard",
        pmod(conv(substring(col("_h"), 1, 8), 16, 10).cast("long"),
          lit(nShards)).cast("long"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"offset div $budget"))
      .withColumn("seq_last", expr(s"(offset + n_tokens - 1) div $budget"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("offset"),
        col("seq_first"), col("seq_last"))
  }

  // --------------------------------------- markup extraction

  /** Markup/boilerplate extraction (trafilatura-shape, reduced to the
    * dialect-portable regex subset — RE2-safe: no lookbehind, no
    * backreferences): split the document on BLOCK-level tags, strip
    * inline tags per block, and keep blocks by an INTEGER
    * link-density rule — a block whose anchor text is half or more of
    * its visible text is navigation/boilerplate, not content. This is
    * the extraction pass a crawl-derived corpus runs BEFORE any dedup
    * or quality stage.
    *
    * BEFORE the block split, one lazy-quantifier pre-pass per
    * non-content element kind removes `<script>`/`<style>` bodies and
    * HTML comments whole (`(?is)<script[^>]*>.*?</script>` etc. —
    * RE2-portable: lazy quantifiers, no backrefs): script/style text
    * has zero anchor density, so without the pre-pass it would sail
    * through the link-density rule and feed JavaScript/CSS into the
    * corpus. An UNCLOSED script tag (malformed markup) degrades to
    * tag-stripping only — its body leaks like any other text; real
    * extractors share this failure mode.
    *
    * Per block (all integers, hash-exact): `clean` = tags stripped,
    * character entities decoded (`&lt; &gt; &quot; &#39;/&#x27;
    * &nbsp;` to their characters, any OTHER numeric entity normalized
    * to a space — deterministic and portable where a full decoder is
    * not — and `&amp;` LAST so `&amp;lt;` decodes to the literal
    * `&lt;` it encodes), whitespace normalized; `linked` = Σ lengths
    * of `<a>` anchor texts (captured with `[^<]*` — no lazy
    * quantifiers needed), same entity decode so the density ratio
    * compares decoded chars to decoded chars.
    * Keep iff length(clean) ≥ `minChars` AND 2·linked < length(clean).
    * Kept blocks re-join in document order via the bounded
    * sort_array(collect_list) idiom — block count per doc, never a
    * global window.
    *
    * Returns (doc_id, n_blocks — nonempty blocks, n_kept,
    * n_link_chars, extracted). */
  def htmlExtract(docs: DataFrame, id: Column, html: Column,
      minChars: Int = 2): DataFrame = {
    val stripped = regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    def decodeEntities(c: Column): Column =
      replace(
        regexp_replace(
          replace(replace(replace(replace(
            regexp_replace(c, "&#x27;|&#39;", "'"),
            lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
            lit("&quot;"), lit("\"")), lit("&nbsp;"), lit(" ")),
          "&#(?:[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});", " "),
        lit("&amp;"), lit("&"))
    val blocks = docs.select(id.as("doc_id"),
        posexplode(split(stripped,
          "</?(?:p|div|li|h[1-6]|br|body|html)[^>]*>"))
          .as(Seq("pos", "blk")))
      .select(col("doc_id"), col("pos"),
        trim(regexp_replace(
          decodeEntities(regexp_replace(col("blk"), "<[^>]*>", "")),
          "\\s+", " ")).as("clean"),
        length(decodeEntities(concat_ws("", regexp_extract_all(col("blk"),
          lit("<a[^>]*>([^<]*)</a>"), lit(1))))).as("linked"))
      .filter(length(col("clean")) > 0)
      .withColumn("keep",
        length(col("clean")) >= minChars &&
          col("linked") * 2 < length(col("clean")))
    blocks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("linked").cast("long")).as("n_link_chars"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("clean"))))),
          s => s.getField("clean"))).as("extracted"))
  }

  // --------------------------------------- unigram-LM tokenizer

  /** Viterbi segmentation of one word under a quantized unigram piece
    * model — the inference kernel of [[unigramTrainState]] /
    * [[unigramEncodeDocs]], shared so train-time counting and
    * encode-time segmentation cannot drift. dp[i] = best product of
    * piece probabilities covering word[0,i); each piece probability
    * is q/2³⁰ — an EXACT dyadic double (q is the ⌊(cnt+1)·2³⁰/(C+V)⌋
    * integer), so every DP step is ONE IEEE multiply on an identical
    * operand tree cross-engine, and the SQL oracle's unrolled DP
    * reproduces every dp value bit-for-bit. Ties at a position break
    * to the LONGER last piece (score desc, len desc — a total order
    * the oracle's row_number replays). Single-char pieces are always
    * in the vocab (trainer invariant), so every position is
    * reachable. */
  private[graft] def viterbiSegment(q: Map[String, Long], maxPieceLen: Int,
      word: String): List[String] = {
    val L = word.length
    val dp = new Array[Double](L + 1)
    val bl = new Array[Int](L + 1)
    dp(0) = 1.0
    var i = 1
    while (i <= L) {
      var best = -1.0
      var bestL = 0
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        if (i - l == 0 || bl(i - l) > 0) {
          q.get(word.substring(i - l, i)) match {
            case Some(qv) =>
              val s = dp(i - l) * (qv.toDouble / 1073741824.0)
              if (s > best || (s == best && l > bestL)) {
                best = s; bestL = l
              }
            case None => ()
          }
        }
        l += 1
      }
      dp(i) = if (bestL == 0) 0.0 else best
      bl(i) = bestL
      i += 1
    }
    require(L == 0 || bl(L) > 0,
      s"unreachable word '$word' — single-char pieces missing from vocab")
    var out = List.empty[String]
    var pos = L
    while (pos > 0) {
      out = word.substring(pos - bl(pos), pos) :: out
      pos -= bl(pos)
    }
    out
  }

  /** Weighted substring-occurrence counts over a (word, wf) frame —
    * the unigram trainer's SEED signal, shared with the drift audit
    * (which compares the top-piece sets of two corpus halves the way
    * `bpe_drift_audit` compares top pair sets). */
  def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("wf"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), st =>
          transform(sequence(lit(1), least(lit(maxPieceLen),
              length(col("word")) - st + lit(1))),
            l => col("word").substr(st, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wf")).as("cnt"))

  /** Top-`vocabSize` multi-char seed pieces of a document set — the
    * round-1 unigram training signal, exposed for the drift audit. */
  def unigramSeedPieces(docs: DataFrame, text: Column,
      maxPieceLen: Int = 4, vocabSize: Int = 24): DataFrame = {
    val words = tokens(docs, text).groupBy(col("token"))
      .agg(count(lit(1)).as("wf"))
      .select(col("token").as("word"), col("wf"))
    substringCounts(words, maxPieceLen)
      .filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabSize)
  }

  /** Unigram-LM (SentencePiece-family) tokenizer TRAINER — the other
    * dominant tokenizer family next to BPE ([[bpeTrainState]]):
    * pieces carry a quantized unigram probability and words segment
    * by Viterbi argmax of the piece-probability product (Kudo 2018,
    * reduced to hash-gateable integer/dyadic algebra).
    *
    *  1. SEED — every substring occurrence of length ≤ `maxPieceLen`
    *     across the distinct-word frame, weighted by word frequency;
    *     the top `vocabSize` multi-char pieces by (count desc, piece
    *     asc) plus ALL single chars (the coverage guarantee) form the
    *     candidate vocabulary.
    *  2. Quantized probabilities — q = ⌊(cnt+1)·2³⁰/(C+V)⌋ (add-one,
    *     the [[graft.ext.Lm]] discipline; BigInt products so corpus-
    *     scale counts cannot wrap); piece probability q/2³⁰ is an
    *     exact dyadic double.
    *  3. ONE hard-EM round — Viterbi-segment the weighted vocab under
    *     the seed model, recount pieces along best paths (Viterbi
    *     counts = hard-EM expected counts), PRUNE pieces no best path
    *     uses (single chars always survive, with count 0 smoothing to
    *     a positive q), re-quantize. This is the SentencePiece
    *     EM+prune round with soft expectations hardened to keep the
    *     algebra integer-exact.
    *
    * Scale shape, identical to the BPE trainer's contract: the corpus
    * is touched once (word-frequency aggregate); the piece table is
    * the only driver-held state (≤ vocabSize + alphabet — bounded
    * scalar by contract); each Viterbi pass is one typed map over the
    * DISTINCT-WORD frame (|vocab| rows, never |corpus tokens|) with
    * the piece map as a broadcast-sized closure.
    *
    * Returns (pieces, vocab): pieces (piece, cnt, q) is the trained
    * model after the EM round; vocab (word, wf, syms) is each word's
    * Viterbi segmentation UNDER that final model — joining doc tokens
    * against it IS encoding. */
  def unigramTrainState(docs: DataFrame, text: Column,
      maxPieceLen: Int = 4, vocabSize: Int = 24)
      : (DataFrame, DataFrame) = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16, "maxPieceLen in [1,16]")
    require(vocabSize >= 1 && vocabSize <= 65536, "vocabSize in [1,65536]")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val words = graft.Tables.materialize(
      tokens(docs, text).groupBy(col("token"))
        .agg(count(lit(1)).as("wf"))
        .select(col("token").as("word"), col("wf"))
        .repartition(p))
    val cand = substringCounts(words, maxPieceLen)
    val multi = cand.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabSize)
    val chars = cand.filter(length(col("piece")) === 1)
    // bounded collect: vocabSize + alphabet rows — the piece table IS
    // the model and must live on the driver for the typed-map closures
    val seedRows = multi.unionByName(chars)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    def quantize(rows: Seq[(String, Long)]): Map[String, Long] = {
      val c = rows.map(r => BigInt(r._2)).sum
      val v = BigInt(rows.size)
      rows.map { case (pc, cnt) =>
        pc -> ((BigInt(cnt) + 1) * BigInt(1L << 30) / (c + v)).toLong
      }.toMap
    }
    val q0 = quantize(seedRows)
    val maxL = maxPieceLen
    val emRows = words.as[(String, Long)]
      .flatMap { case (w, wf) =>
        viterbiSegment(q0, maxL, w).map(pc => (pc, wf)) }
      .toDF("piece", "wf")
      .groupBy(col("piece")).agg(sum(col("wf")).as("cnt"))
      .as[(String, Long)].collect().toSeq
    val used = emRows.map(_._1).toSet
    val kept = (emRows ++ seedRows.collect {
        case (pc, _) if pc.length == 1 && !used(pc) => (pc, 0L)
      }).sortBy(_._1)
    val q1 = quantize(kept)
    val pieces = kept.map { case (pc, cnt) => (pc, cnt, q1(pc)) }
      .toDF("piece", "cnt", "q")
    val vocab = words.as[(String, Long)]
      .map { case (w, wf) => (w, wf, viterbiSegment(q1, maxL, w)) }
      .toDF("word", "wf", "syms")
    (pieces, vocab)
  }

  /** Corpus encode under a TRAINED unigram model — the
    * [[bpeEncodeDocsWithVocab]] shape: the trained vocab frame (each
    * distinct word's Viterbi segmentation) joins doc tokens back and
    * flattens in document order; the per-word DP never re-runs per
    * occurrence. Output (doc_id, n_ws, bpe — the piece sequence). */
  def unigramEncodeDocs(docs: DataFrame, id: Column, text: Column,
      vocab: DataFrame): DataFrame = {
    val toked = docs.select(id.as("doc_id"),
        filter(split(text, " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
    bpeEncodeDocsWithVocab(toked, vocab)
  }

  // ------------------------------------------------- vocab / tf-idf

  /** Whitespace tokens of `text`, one row per (rest-of-row, token).
    * Single-space split, empties dropped — the deterministic baseline
    * tokenizer (byte-identical across engines; no locale-dependent
    * lowercasing). */
  /** Temperature-scaled mixture ALLOCATION (α = 1/2) — the standard
    * multilingual rebalancing: sampling weight w_l ∝ n_l^α flattens
    * the head languages and up-samples the tail (α=1 is proportional,
    * α=0 uniform). Kept hash-gateable by integer algebra: the weight
    * is ⌊√n_l⌋ (IEEE sqrt is exact-rounded, so both engines floor the
    * SAME double), the normalizer is the exact BIGINT Σ⌊√n⌋, and each
    * stratum's allocation is `budget·w_l div W` — floor division, no
    * float shares. (Largest-remainder seats are left unassigned;
    * callers wanting them distribute by (remainder desc, stratum asc)
    * — documented, not silently approximated.) One stratum-count
    * aggregate + a 1-row broadcast normalizer at any corpus size. */
  def mixtureAllocationSqrt(docs: DataFrame, stratum: Column,
      budget: Long): DataFrame = {
    val counts = docs.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val total = counts.agg(sum(col("w")).as("tw"))
    counts.crossJoin(broadcast(total))
      .select(col("stratum"), col("n_docs"), col("w"),
        expr(s"CAST($budget * w div tw AS BIGINT)").as("n_take"))
  }

  /** Per-document out-of-vocabulary rate against the corpus top-`k`
    * token vocabulary — the tokenizer-coverage signal that decides
    * whether a vocab (or a language's share of it) is big enough
    * before training: high OOV docs either get dropped or argue for
    * a bigger vocab. Token-level (not distinct — a repeated OOV word
    * costs every occurrence, as it would in training). Same scale
    * shape as [[bigramNovelty]]: TakeOrdered vocabulary cut on the
    * (count desc, token asc) total order, broadcast membership join,
    * one doc-keyed aggregate; integer counts, one IEEE divide. */
  def oovRate(docs: DataFrame, id: Column, text: Column,
      vocabK: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
        explode(filter(split(text, " "), t => t =!= "")).as("token"))
    val vocab = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(vocabK)
      .select(col("token"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Bigram-LM novelty scoring — the cheapest useful "how far is this
    * document from the corpus's n-gram language model" signal: the
    * fraction of a document's distinct word bigrams NOT in the corpus
    * top-`vocabK` bigram vocabulary. High novelty flags boilerplate-
    * free/unusual text (or garbage); near-zero novelty flags template
    * spam — the same filtering axis a real KenLM perplexity score
    * gives, kept hash-gateable by using an integer membership ratio
    * instead of log-probabilities (ln is not cross-engine bit-stable,
    * SKILL.md).
    *
    * Scale: bigram explode is map-side; the vocabulary cut is a
    * distributed TakeOrdered on (df desc, gram asc) — a total order,
    * so the cut is deterministic — and `vocabK` rows broadcast to an
    * existence join; one doc-keyed aggregate. The vocabulary is the
    * reusable model artifact: score tomorrow's crawl against today's
    * vocab without recomputing it. */
  def bigramNovelty(docs: DataFrame, id: Column, text: Column,
      vocabK: Int = 1000): DataFrame = {
    val g = graft.Tables.materialize(
      Dedup.shingles(docs, id, text, n = 2))
    val vocab = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram").asc).limit(vocabK)
      .select(col("gram"), lit(1L).as("known"))
    val per = g.join(broadcast(vocab), Seq("gram"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("nb"),
        sum(coalesce(col("known"), lit(0L))).as("nk"))
    docs.select(id.as("id")).join(per, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("nk"), lit(0L)).as("n_known"),
        when(coalesce(col("nb"), lit(0L)) > 0,
          (col("nb") - col("nk")).cast("double") / col("nb").cast("double"))
          .as("novelty"))
  }

  /** Boilerplate stripping — the C4-style "remove repeated lines"
    * pass, REWRITING each document: tokens tile into consecutive
    * `tileTokens`-token pseudo-lines, tiles whose exact text repeats
    * `minFreq`+ times corpus-wide (headers, footers, licence blocks,
    * nav chrome) are dropped, and the document is reassembled from
    * its surviving tiles in original order. Complements
    * [[Dedup.repeatedSpanCoverage]]: that one SCORES duplication,
    * this one produces the cleaned text a training export actually
    * writes.
    *
    * Scale: tiling is a per-row expression (map-side at scan
    * parallelism); one map-side-combined tile-frequency aggregate +
    * one join-back on the tile key (hot boilerplate tiles become AQE-
    * splittable join skew, never collected); reassembly is one hash
    * shuffle on doc id with a per-doc `sort_array` — no windows. */
  def stripRepeatedTiles(df: DataFrame, id: Column, text: Column,
      tileTokens: Int = 8, minFreq: Int = 2): DataFrame = {
    require(tileTokens >= 1, "tileTokens >= 1")
    require(minFreq >= 2, "minFreq >= 2")
    val p = df.sparkSession.sparkContext.defaultParallelism
    val toked = df.select(id.as("doc_id"),
        graft.functions.TextFunctions.tokens(text).as("toks"))
      .repartition(p)
    val t = lit(tileTokens)
    // when-guard: sequence(0, -1) would generate a DESCENDING range
    val tiling = when(size(col("toks")) > 0,
      transform(
        sequence(lit(0), (size(col("toks")) + (tileTokens - 1))
          .divide(t).cast("int") - 1),
        i => concat_ws(" ", slice(col("toks"), i * t + 1, t))))
      .otherwise(array())
    val tiles = graft.Tables.materialize(toked
      .select(col("doc_id"), posexplode(tiling))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("tile")))
    val dup = tiles.groupBy(col("tile"))
      .agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minFreq)
      .select(col("tile"))
    val kept = tiles.join(dup, Seq("tile"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tile")))),
          s => s.getField("tile"))).as("clean_text"))
    val counts = tiles.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tiles"))
    df.select(id.as("doc_id"))
      .join(counts, Seq("doc_id"), "left_outer")
      .join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_tiles"), lit(0L)).as("n_tiles"),
        (coalesce(col("n_tiles"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** BPE pair statistics — the tokenizer-training inner loop: adjacent
    * character-pair frequencies across the corpus, each word's pairs
    * weighted by the word's occurrence count (count the WORD TABLE
    * once, then explode pairs over the compact vocabulary — the
    * standard trick that makes BPE training corpus-size-independent
    * after one pass). The top pair is what a BPE trainer would merge
    * next; re-running after a merge is the same query over the
    * rewritten vocabulary. Top-50 cut on the (count desc, pair asc)
    * total order.
    *
    * Scale: one token aggregate over the corpus (map-side combined),
    * then everything runs on |vocab| rows. */
  def bpePairCounts(docs: DataFrame, text: Column, k: Int = 50): DataFrame = {
    val words = tokens(docs, text)
      .groupBy(col("token")).agg(count(lit(1)).as("wf"))
    words
      .select(col("wf"), explode(expr(
        "CASE WHEN length(token) >= 2 THEN " +
          "transform(sequence(1, length(token) - 1), " +
          "i -> substr(token, i, 2)) ELSE array() END")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("n"))
      .orderBy(col("n").desc, col("pair").asc).limit(k)
  }

  def tokens(df: DataFrame, text: Column): DataFrame =
    df.withColumn("token", explode(split(text, " ")))
      .filter(col("token") =!= "")

  /** Vocabulary: the `k` most frequent tokens (count desc, token asc
    * — total order, so the cut is deterministic) with ranks.
    * Token counting is a map-side-combined hash aggregation. The cut
    * is a distributed TakeOrdered (per-partition top-k heads, merged)
    * — NOT a rank-then-filter window, which would funnel the whole
    * aggregated vocabulary through one partition (a web-scale corpus
    * has hundreds of millions of distinct tokens; round-9 plan audit
    * caught exactly that WindowExec warning here). Only the k
    * survivors pass through the single-partition ranking window,
    * which is bounded by k at any corpus size. */
  def vocabTopK(docs: DataFrame, text: Column, k: Int): DataFrame = {
    val counts = tokens(docs, text).groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
    val topk = counts.orderBy(col("n").desc, col("token").asc).limit(k)
    val w = Window.orderBy(col("n").desc, col("token").asc)
    topk.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Per-document repetition statistics — the Gopher/C4-family
    * repetition quality signals a pre-training filter thresholds on:
    *  - `dup_token_ratio`: 1 - distinct/total whitespace tokens
    *    (0 for an empty token list);
    *  - `top_bigram_ratio`: occurrences of the most frequent word
    *    bigram / total bigrams (0 when fewer than 2 tokens).
    * Shapes: token ratios are per-row array expressions (no shuffle);
    * bigram stats are one explode + two map-side-combined hash aggs
    * keyed by doc — no sorts, no windows, O(tokens) shuffle rows.
    * Integer counts divided once at the end as doubles, so results
    * are bit-identical across engines. */
  def repetitionStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toked = df.select(id.as("doc_id"),
      graft.functions.TextFunctions.tokens(text).as("toks"))
    val base = toked.select(col("doc_id"), size(col("toks")).as("n"),
      size(array_distinct(col("toks"))).as("nd"))
    val grams = toked.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2)))))
        .otherwise(array())).as("gram"))
    val gstats = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("maxc"), sum(col("c")).as("totc"))
    base.join(gstats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n") > 0,
          lit(1.0) - col("nd").cast("double") / col("n").cast("double"))
          .otherwise(lit(0.0)).as("dup_token_ratio"),
        when(col("totc") > 0,
          col("maxc").cast("double") / col("totc").cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_ratio"))
  }

  /** TF-IDF per (doc, token). `idf` is the RAW ratio |docs| / df —
    * monotone in the textbook log-idf (so rankings agree) but free of
    * `ln`, whose last-ulp rounding differs between libm
    * implementations; tf * (N/df) is two correctly-rounded IEEE ops,
    * bit-identical on every engine. Two aggregations (tf, df) + one
    * broadcast-joined scalar (N); the df side joins back on the token
    * key — all map-side combined, no all-pairs anything. */
  def tfIdf(docs: DataFrame, docId: Column, text: Column): DataFrame = {
    val toks = tokens(docs.select(docId.as("doc_id"), text.as("_text")),
      col("_text")).select(col("doc_id"), col("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.select(docId).distinct().agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("tfidf"))
  }

  // ------------------------------------------------- outlier trim

  /** Per-group winsorization: clamp `value` to its group's
    * [`lo`, `hi`] exact percentiles — the outlier-trimming pass run
    * over corpus quality signals before thresholding (a handful of
    * garbage documents otherwise drag a percentile-calibrated cutoff).
    * Adds `winsor_lo`/`winsor_hi` (the group bounds) and `value_w`
    * (the clamped value; only comparisons, no arithmetic — bit-stable
    * on any engine).
    *
    * Two passes over the input but ONE broadcast-joined bounds frame
    * (|groups| rows): at 100 TB the bounds aggregation map-side
    * combines to one row per group per partition, and the clamp pass
    * is shuffle-free. Exact percentiles sort only within the
    * aggregation buffers; for extreme cardinality groups swap in
    * `percentile_approx` upstream. */
  def winsorize(df: DataFrame, group: Column, value: Column,
      lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "0 <= lo < hi <= 1")
    val bounds = df.groupBy(group.as("_wg"))
      .agg(call_function("percentile", value, lit(lo)).as("winsor_lo"),
        call_function("percentile", value, lit(hi)).as("winsor_hi"))
    // null-safe equality: the bounds aggregate emits a NULL-group row,
    // and plain === would silently drop every NULL-group input row
    df.join(broadcast(bounds), group <=> col("_wg"))
      .drop("_wg")
      .withColumn("value_w",
        least(greatest(value, col("winsor_lo")), col("winsor_hi")))
  }

  // ------------------------------------------- edit-distance verify

  /** Exact edit-distance near-dup pairs within blocking groups:
    * self-join on `blockKey` (docs that share a block are candidates
    * — at scale the block comes from LSH/SimHash banding, see
    * [[Dedup.simhashNearDupPairs]]), then Levenshtein on a bounded
    * prefix, keeping pairs within `maxDist`. The quadratic cost is
    * confined to each block; prefix length bounds the per-pair DP
    * cost at `prefixLen²` regardless of document size. */
  def editDistancePairs(docs: DataFrame, id: Column, text: Column,
      blockKey: Column, prefixLen: Int, maxDist: Int): DataFrame = {
    val side = docs.select(id.as("id"), blockKey.as("blk"),
      substring(text, 1, prefixLen).as("pfx"))
    val l = side.select(col("id").as("id_a"), col("blk"),
      col("pfx").as("pfx_a"))
    val r = side.select(col("id").as("id_b"), col("blk"),
      col("pfx").as("pfx_b"))
    l.join(r, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("pfx_a"), col("pfx_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Consistent-hash ring with `vnodes` virtual nodes per shard:
    * sorted (position, shard) pairs, positions =
    * [[TextFunctions.hash32Local]] of "node|shard|replica". Driver-
    * side constant (n·vnodes entries), broadcast into the plan as
    * array literals by [[ringAssign]]. */
  def consistentRing(n: Int, vnodes: Int): Seq[(Long, Int)] =
    (for { s <- 0 until n; r <- 0 until vnodes }
      yield (TextFunctions.hash32Local(s"node|$s|$r"), s))
      .sortBy(p => (p._1, p._2))

  /** Shard for a 32-bit key hash under the ring: the first ring
    * position ≥ h clockwise, wrapping to the ring head. One codegen'd
    * scalar ([[graft.functions.RingHash.ringAssign]]: JIT-compiled
    * binary search over the broadcast ring literals) — map-side only,
    * no join, no shuffle, O(log ring) per row, inside whole-stage
    * codegen where the `size(filter(...))` HOF formulation would drop
    * to interpreted per-row lambdas. Ties in ring positions break by
    * shard ascending via [[consistentRing]]'s (position, shard)
    * sort. */
  def ringAssign(h: Column, ring: Seq[(Long, Int)]): Column =
    graft.functions.RingHash.ringAssign(h,
      lit(ring.map(_._1).toArray), lit(ring.map(_._2.toLong).toArray))

  /** Consistent-hashing REBALANCE audit — the ops question behind
    * every shard-count change at 100 TB: how many keys move when the
    * fleet grows from `nOld` to `nNew` shards? With plain modulo
    * hashing nearly everything moves; a consistent ring moves ~1/nNew
    * of the keys, and THIS measurement (per-source-shard key count,
    * moved count, moved fraction) is how the claim gets verified
    * before a live resharding. One map-side pass assigns every key
    * under BOTH rings (broadcast literals, no shuffle), one hash
    * aggregate reduces to nOld rows. */
  def shardRebalance(df: DataFrame, key: Column,
      nOld: Int, nNew: Int, vnodes: Int = 16): DataFrame = {
    require(nOld >= 1 && nNew >= 1 && vnodes >= 1, "positive ring")
    val h = TextFunctions.hash32(key.cast("string"))
    val assigned = df.select(
      ringAssign(h, consistentRing(nOld, vnodes)).as("shard"),
      ringAssign(h, consistentRing(nNew, vnodes)).as("shard_new"))
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("shard") =!= col("shard_new"), 1L).otherwise(0L))
          .as("n_moved"))
      .withColumn("moved_frac",
        col("n_moved").cast("double") / col("n_keys").cast("double"))
  }

  /** Maximal-Marginal-Relevance re-ranking over a bounded candidate
    * list — the diversity stage of a retrieval stack: greedily pick
    * the candidate maximizing λ·relevance − (1−λ)·max-similarity-to-
    * already-selected, so near-duplicate hits don't crowd the top-k.
    * Similarity here is exact Jaccard over the candidates' DISTINCT
    * token arrays (callers pass `array_distinct` columns; pairwise
    * sims are one bounded cross product, |cand|² rows).
    *
    * Single-list convenience form of [[mmrRerankGrouped]] (one
    * constant group) — same semantics, same IEEE trees, ONE plan
    * with zero driver round-trips. Returns (rnk 1..k, id,
    * mmr_score). */
  def mmrRerank(cand: DataFrame, id: Column, score: Column,
      toks: Column, k: Int, lambda: Double = 0.5): DataFrame =
    mmrRerankGrouped(cand, lit("q"), id, score, toks, k, lambda)
      .select(col("rnk"), col("id"), col("mmr_score"))

  /** PER-QUERY-GROUP Maximal-Marginal-Relevance re-ranking — the
    * batch shape a retrieval stack actually runs: thousands of query
    * candidate lists re-ranked in ONE plan. Each group's candidates
    * are BOUNDED by the upstream retriever (10-ish per query), so the
    * whole greedy state fits in a `flatMapGroups` over one shuffle on
    * the query id: pairwise exact-Jaccard sims and the k argmax picks
    * run in-memory per group, never through the driver — at 100 TB
    * the expensive part stays upstream retrieval; MMR cost is
    * |cand|²+k·|cand| per group, embarrassingly parallel across
    * groups.
    *
    * Determinism (hash-gate contract, identical to the SQL twin):
    * round 1 scores λ·rel; later rounds λ·rel − (1−λ)·max-sim-to-
    * selected in that exact IEEE order; Jaccard over the candidates'
    * DISTINCT token sets is one exact-rounded divide of exact
    * integers; argmax ties break on id ascending. max over sims is
    * order-independent, so per-group replay is bit-exact. Returns
    * (qid string, rnk 1..k, id, mmr_score). */
  def mmrRerankGrouped(cand: DataFrame, qid: Column, id: Column,
      score: Column, toks: Column, k: Int,
      lambda: Double = 0.5, maxCand: Int = 4096): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = cand.sparkSession
    import spark.implicits._
    cand.select(qid.cast("string").as("qid"), id.cast("long").as("id"),
        score.cast("double").as("rel"), toks.as("toks"))
      .as[(String, Long, Double, Seq[String])]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        // bounded per contract (retriever top-N). The cap turns an
        // upstream bug feeding an unbounded group into a loud failure
        // instead of an executor OOM from the |cand|² sim matrix.
        val cs = it.take(maxCand + 1).toArray
        require(cs.length <= maxCand,
          s"mmrRerankGrouped: query group '$q' exceeds maxCand=" +
            s"$maxCand candidates — the upstream retriever must bound " +
            "per-query candidate lists (or raise maxCand)")
        val n = cs.length
        val sets: Array[Set[String]] = cs.map(_._4.toSet)
        def sim(i: Int, j: Int): Double = {
          var inter = 0
          val (small, large) =
            if (sets(i).size <= sets(j).size) (sets(i), sets(j))
            else (sets(j), sets(i))
          small.foreach(t => if (large.contains(t)) inter += 1)
          inter.toDouble / (sets(i).size + sets(j).size - inter).toDouble
        }
        val selected = new scala.collection.mutable.ArrayBuffer[Int](k)
        val chosen = new Array[Boolean](n)
        val out =
          new scala.collection.mutable.ArrayBuffer[(String, Long, Long, Double)](k)
        var t = 1
        while (t <= k && selected.length < n) {
          var best = -1
          var bestMmr = 0.0
          var i = 0
          while (i < n) {
            if (!chosen(i)) {
              val mmr =
                if (selected.isEmpty) cs(i)._3 * lambda
                else {
                  var ms = 0.0 // sims are >= 0; matches SQL coalesce(max, 0)
                  selected.foreach { j =>
                    val s0 = sim(i, j); if (s0 > ms) ms = s0
                  }
                  cs(i)._3 * lambda - ms * (1.0 - lambda)
                }
              if (best < 0 || mmr > bestMmr ||
                  (mmr == bestMmr && cs(i)._2 < cs(best)._2)) {
                best = i; bestMmr = mmr
              }
            }
            i += 1
          }
          chosen(best) = true
          selected += best
          out += ((q, t.toLong, cs(best)._2, bestMmr))
          t += 1
        }
        out
      }
      .toDF("qid", "rnk", "id", "mmr_score")
  }

  /** Sorted-neighborhood record linkage — the third classic blocking
    * strategy next to [[editDistancePairs]]' standard blocking and
    * the deletion-neighborhood join: rows sort by a canonical key,
    * and ONLY rows within `w` positions of each other in that total
    * order are compared (verified here with exact Levenshtein on a
    * prefix). Sorted-neighborhood catches the pairs hard blocking
    * splits apart (a typo in the block key lands the twin in a
    * different block but usually in a NEARBY sort position) at a
    * guaranteed candidate budget of ≤ w·n pairs — no hot-block
    * quadratic anywhere, the property that made multi-pass SNM the
    * workhorse of pre-LSH record linkage.
    *
    * Scale shape: the global sort position comes from
    * [[globalOrderRank]] (range partition + offset prefix sums — no
    * single-partition window), and the neighbor pairing is an
    * EQUI-join on the rank block floor(rank/w): each left row joins
    * its own block and the next (2 exploded keys), then the true
    * rank-distance filter keeps 1..w. Shuffle volume is 2n rows
    * keyed by block id; `w` bounds per-key fan-in by construction.
    *
    * Returns (id_a, id_b, dist ≤ maxDist), id_a earlier in sort
    * order. */
  def sortedNeighborPairs(docs: DataFrame, id: Column, sortKey: Column,
      text: Column, prefixLen: Int, w: Int, maxDist: Int,
      numPartitions: Int = 32): DataFrame = {
    require(w >= 1, "w must be >= 1")
    val side = docs.select(id.as("id"), sortKey.as("sk"),
      substring(text, 1, prefixLen).as("pfx"))
    val ranked = globalOrderRank(side, numPartitions,
      col("sk"), col("id"))
    val a = ranked.select(col("id").as("id_a"), col("pfx").as("pfx_a"),
        col("_rank").as("rank_a"),
        explode(array(floor(col("_rank") / w),
          floor(col("_rank") / w) + 1)).as("bkt"))
    val b = ranked.select(col("id").as("id_b"), col("pfx").as("pfx_b"),
      col("_rank").as("rank_b"),
      floor(col("_rank") / w).as("bkt"))
    a.join(b, "bkt")
      .filter((col("rank_b") - col("rank_a")).between(1, w))
      .withColumn("dist",
        levenshtein(col("pfx_a"), col("pfx_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** LOSSLESS fuzzy self-join at edit distance ≤ 1 via deletion-
    * neighborhood blocking (the FastSS family): each key emits itself
    * plus its |k| single-character deletions; any two strings within
    * one edit (substitution, insertion, or deletion) share at least
    * one variant, so an equi-join on the variant finds EVERY qualifying
    * pair — unlike heuristic prefix/LSH blocks there is no recall loss
    * to audit. Candidates are deduped, then verified with exact
    * Levenshtein.
    *
    * Scale: |k|+1 variant rows per input row, one hash shuffle on the
    * variant string, quadratic cost confined to per-variant buckets
    * (bucket size = strings sharing a deletion — bounded by key-space
    * collision structure, salt the join if a degenerate key dominates).
    * Keys must be short (titles, codes, acronyms) — the method is for
    * k≤2 keys, not documents; pair it with [[Dedup]] sketches for
    * long text. */
  def fuzzyJoinDeletion(docs: DataFrame, id: Column, key: Column): DataFrame = {
    val side = docs.select(id.as("id"), key.as("k"))
    val delVariants = transform(
      sequence(lit(1), length(col("k"))),
      i => concat(col("k").substr(lit(1), i - 1),
        col("k").substr(i + 1, length(col("k")) - i)))
    val exploded = side.select(col("id"), col("k"),
      explode(array_distinct(concat(array(col("k")), delVariants)))
        .as("variant"))
    val l = exploded.select(col("id").as("id_a"), col("k").as("k_a"),
      col("variant"))
    val r = exploded.select(col("id").as("id_b"), col("k").as("k_b"),
      col("variant"))
    l.join(r, "variant")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("k_a"), col("k_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("k_a"), col("k_b")).cast("long"))
      .filter(col("dist") <= 1L)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Paragraph/block-level exact dedup (the C4 recipe: drop every
    * repeated three-sentence span corpus-wide, keeping ONE
    * occurrence). The corpus here has no sentence boundaries, so the
    * unit is a fixed `blockWords`-word non-overlapping block — the
    * same granularity trade as C4's span, between whole-document
    * dedup ([[Dedup.fingerprint]]) and overlapping-gram span dedup
    * ([[Dedup.repeatedSpans]]).
    *
    * Keeper rule: the first occurrence in (doc_id, block_idx) order
    * keeps; later repeats drop. That is ONE `min(struct)` hash
    * aggregate on the block text (map-side combined, skew-safe — a
    * corpus-dominating boilerplate block reduces on the map side,
    * never fills one reducer the way a row_number window would) plus
    * an equality join back, then one doc-key shuffle to reassemble
    * surviving blocks in order. Three shuffles total, none
    * quadratic, no window over an unbounded partition.
    *
    * Output: (doc_id, n_blocks, n_kept, kept_text) — kept_text is
    * the surviving blocks rejoined in document order ('' when every
    * block was a repeat). */
  def paragraphDedup(docs: DataFrame, id: Column, text: Column,
      blockWords: Int = 10): DataFrame = {
    require(blockWords >= 1, s"blockWords must be >= 1, got $blockWords")
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val words = split(col("text"), " ")
    // per-row block construction — no shuffle; slice() bounds the
    // lambda input so the interpreted HOF touches each word once
    val blocks = base
      .withColumn("n_blocks",
        ceil(size(words) / lit(blockWords.toDouble)).cast("long"))
      .select(col("doc_id"), col("n_blocks"),
        posexplode(expr(
          s"""transform(sequence(0, int(n_blocks) - 1),
             |  b -> array_join(slice(split(text, ' '),
             |                        b * $blockWords + 1, $blockWords),
             |                  ' '))""".stripMargin))
          .as(Seq("block_idx", "block_text")))
    val keepers = blocks.groupBy(col("block_text").as("kb_text"))
      .agg(min(struct(col("doc_id"), col("block_idx"))).as("keeper"))
      .select(col("kb_text"), col("keeper.doc_id").as("k_doc"),
        col("keeper.block_idx").as("k_idx"))
    val kept = blocks.join(keepers,
        col("block_text") === col("kb_text") &&
          col("doc_id") === col("k_doc") &&
          col("block_idx").cast("long") === col("k_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        expr("""array_join(transform(
               |  sort_array(collect_list(struct(block_idx, block_text))),
               |  s -> s.block_text), ' ')""".stripMargin).as("kept_text"))
    base.select(col("doc_id"),
        ceil(size(words) / lit(blockWords.toDouble)).cast("long")
          .as("n_blocks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Segmented inverted index (term → posting list) — the retrieval-
    * side artifact a corpus pipeline exports next to the training
    * shards. Postings are built per (term, segment) where segment =
    * doc_id mod `segments`: that is the production shape — a
    * stopword's posting list is corpus-sized, so an UNSEGMENTED index
    * would funnel it through one reducer and emit one giant row,
    * while segmenting bounds every group by |segment| and lets
    * retrieval fan out segment-parallel. One (term, doc) tf
    * aggregate, one (term, segment) assembly — two map-side-combined
    * shuffles, postings ordered by doc_id inside each segment.
    *
    * Output: (term, segment, df, cf, postings) with df = docs in
    * segment containing term, cf = total occurrences, postings =
    * "doc:tf doc:tf ..." sorted by doc id. */
  def invertedIndex(docs: DataFrame, id: Column, text: Column,
      segments: Int = 4): DataFrame = {
    require(segments >= 1, s"segments must be >= 1, got $segments")
    val tf = docs
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"), pmod(col("doc_id"), lit(segments.toLong))
        .as("segment"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        expr("""array_join(transform(
               |  sort_array(collect_list(struct(doc_id, tf))),
               |  s -> concat(s.doc_id, ':', s.tf)), ' ')""".stripMargin)
          .as("postings"))
  }

  /** Pareto frontier (skyline) — the non-dominated set under
    * minimize-both (x, y): a row survives iff no other row is <= on
    * both axes and < on at least one. The corpus-prep use is data
    * valuation frontiers (cost vs quality); the gate runs it as
    * cheapest-smallest parts.
    *
    * Distributed shape: dominance only flows from smaller x, so
    * pre-aggregate min(y) per distinct x (map-side combined — the
    * row-count collapses to |distinct x| before anything sorts),
    * then ONE window pass over the distinct-x frame computes the
    * strict-prefix running min. A row is dominated iff
    * (a) some strictly-smaller x has min-y <= its y, or
    * (b) its own x group has min-y < its y.
    * The window partition is the distinct-x frame, orders of
    * magnitude smaller than the input; at 100 TB with ~continuous x,
    * range-bucket the x axis first (per-bucket frontier, then a
    * broadcast merge of bucket frontiers — frontier size is bounded
    * by the bucket count). */
  def paretoFrontier(df: DataFrame, keyCol: Column, x: Column, y: Column)
      : DataFrame = {
    val base = df.select(keyCol.as("key"), x.as("x"), y.as("y"))
    val perX = base.groupBy(col("x").as("px")).agg(min(col("y")).as("miny"))
    val w = Window.orderBy(col("px").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perX
      .withColumn("prefix_miny", min(col("miny")).over(w))
    base.join(prefix, col("x") === col("px"))
      .filter(
        (col("prefix_miny").isNull || col("prefix_miny") > col("y")) &&
          col("miny") >= col("y"))
      .select(col("key"), col("x"), col("y"))
  }

  // ---------------------------------------------------- eval overlap

  /** Clipped n-gram overlap counts (the ROUGE-n / BLEU-precision
    * primitive) over a (cand_id, ref_id) pair frame: per pair, the
    * clipped match Σ_g min(cnt_cand(g), cnt_ref(g)) plus both total
    * gram counts — the three integers every overlap metric derives
    * from (P = m/tc, R = m/tr, and F1 collapses exactly to
    * 2m/(tc+tr), so one division each and no intermediate float
    * feeds another). Counts are MULTISET counts, not the dedup
    * family's distinct-gram sets — clipping is what makes repeated
    * grams score correctly (BLEU's fix for "the the the").
    *
    * Scale shape: gram counting is one explode + hash aggregate per
    * side reusing the corpus pass; the pair join touches only grams
    * of paired docs (equi-join on (pair, gram)); zero-overlap pairs
    * survive via the left join. Pairs are the caller's frame — an
    * eval harness joins (candidate, reference) ids, a dedup audit
    * joins its verified pairs. */
  def ngramOverlapCounts(docs: DataFrame, id: Column, text: Column,
      pairs: DataFrame, n: Int): DataFrame = {
    require(n >= 1 && n <= 8, "n in [1,8]")
    val p = docs.sparkSession.sparkContext.defaultParallelism
    // split-on-space + drop empty tokens (the [[tokens]] convention):
    // a whitespace-regex split yields a single "" token for empty
    // docs, which would count one phantom unigram against the
    // filtered-split oracle
    val toked = docs
      .select(id.as("id"),
        filter(split(text, " "), t => t =!= lit("")).as("toks"))
      .repartition(p)
    val grams = when(size(col("toks")) >= n,
      transform(sequence(lit(1), size(col("toks")) - (n - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
      .otherwise(array())
    val g = toked.select(col("id"), explode(grams).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
    val tot = g.groupBy(col("id")).agg(sum(col("cnt")).as("tot"))
    val m = pairs
      .join(g.select(col("id").as("cand_id"), col("gram"),
        col("cnt").as("cc")), Seq("cand_id"))
      .join(g.select(col("id").as("ref_id"), col("gram"),
        col("cnt").as("rc")), Seq("ref_id", "gram"))
      .groupBy(col("cand_id"), col("ref_id"))
      .agg(sum(least(col("cc"), col("rc"))).as("n_match"))
    pairs
      .join(m, Seq("cand_id", "ref_id"), "left_outer")
      .join(tot.select(col("id").as("cand_id"), col("tot").as("tot_c")),
        Seq("cand_id"), "left_outer")
      .join(tot.select(col("id").as("ref_id"), col("tot").as("tot_r")),
        Seq("ref_id"), "left_outer")
      .select(col("cand_id"), col("ref_id"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        coalesce(col("tot_c"), lit(0L)).as("tot_c"),
        coalesce(col("tot_r"), lit(0L)).as("tot_r"))
  }

  /** ROUGE-style P/R/F1 readout over [[ngramOverlapCounts]]' integer
    * triple: each value is ONE IEEE division of exact longs (F1 =
    * 2m/(tc+tr) — algebraically equal to 2PR/(P+R) with no float
    * composition); degenerate sides (no grams at this n) score 0. */
  def overlapScores(counts: DataFrame, prefix: String): DataFrame = {
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(lit(0.0))
    counts.select(col("cand_id"), col("ref_id"),
      col("n_match").as(s"${prefix}_match"),
      col("tot_c").as(s"${prefix}_tot_c"),
      col("tot_r").as(s"${prefix}_tot_r"),
      ratio(col("n_match"), col("tot_c")).as(s"${prefix}_p"),
      ratio(col("n_match"), col("tot_r")).as(s"${prefix}_r"),
      ratio(lit(2L) * col("n_match"), col("tot_c") + col("tot_r"))
        .as(s"${prefix}_f1"))
  }

  // ------------------------------------------------------- wordpiece

  /** WordPiece vocabulary induction (the BERT tokenizer family —
    * completes the trio next to BPE and unigram-LM): every
    * occurrence-form piece of every distinct corpus word — substrings
    * of char length 1..`maxPieceLen`, word-initial pieces bare and
    * mid-word pieces `##`-prefixed — weighted by corpus word
    * frequency. The vocabulary keeps ALL single-char pieces (the
    * greedy encoder's fallback, so corpus-trained encode never UNKs a
    * length-bounded word) plus the `topMulti` most frequent
    * multi-char pieces under the (n DESC, piece ASC) total order.
    *
    * Scale shape: the corpus is touched once (the word-frequency
    * aggregate); piece enumeration runs over DISTINCT words only
    * (millions of rows at 100 TB, not trillions of tokens) and
    * map-side-combines into a piece-keyed aggregate; the multi-char
    * cut is a distributed TakeOrdered (per-partition heads, merged) —
    * never a global rank-then-filter window. Returns (piece, n). */
  def wordpieceVocab(docs: DataFrame, text: Column,
      maxPieceLen: Int = 6, topMulti: Int = 150): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16, "maxPieceLen in [1,16]")
    require(topMulti >= 0 && topMulti <= 65536, "topMulti in [0,65536]")
    val words = tokens(docs, text)
      .groupBy(col("token")).agg(count(lit(1)).as("wf"))
      .select(col("token").as("word"), col("wf"))
    val occ = words.select(col("wf"),
      explode(flatten(transform(
        sequence(lit(0), length(col("word")) - 1),
        s => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - s)),
          l => when(s === 0, col("word").substr(lit(1), l))
            .otherwise(concat(lit("##"),
              col("word").substr(s + 1, l))))))).as("piece"))
    val counts = occ.groupBy(col("piece")).agg(sum(col("wf")).as("n"))
      .withColumn("clen", when(col("piece").startsWith("##"),
        length(col("piece")) - 2).otherwise(length(col("piece"))))
    counts.filter(col("clen") === 1).select(col("piece"), col("n"))
      .unionByName(counts.filter(col("clen") >= 2)
        .orderBy(col("n").desc, col("piece").asc).limit(topMulti)
        .select(col("piece"), col("n")))
  }

  /** Greedy longest-match-first WordPiece ENCODE over a distinct-word
    * frame (word, wf) against a (piece, …) vocabulary — BERT's
    * tokenization rule: per word, repeatedly take the LONGEST
    * vocabulary piece matching at the cursor (`##`-prefixed once the
    * cursor has moved); a position with no matching piece, or a word
    * longer than `maxChars`, collapses the whole word to `[UNK]`.
    *
    * The loop is `maxChars` FIXED rounds (each round consumes ≥ 1
    * char of every still-active word, so the bound is exact and the
    * DuckDB oracle unrolls the rounds as CTEs — the pageRank/BPE
    * discipline; finished words pass through untouched). Per round:
    * one bounded explode (≤ `maxPieceLen` candidates per active
    * word), one broadcast join against the vocabulary, one per-word
    * argmax, one rewrite — all over the DISTINCT-word frame, never
    * the corpus. Returns (word, wf, pieces, n_pieces) with `pieces`
    * space-joined. */
  def wordpieceEncodeWords(words: DataFrame, vocab: DataFrame,
      maxChars: Int = 12, maxPieceLen: Int = 6): DataFrame = {
    require(maxChars >= 1 && maxChars <= 32, "maxChars in [1,32]")
    // materialize the vocabulary ONCE: the broadcast join below sits
    // inside the fixed-round loop, and an un-materialized plan would
    // re-run the whole vocabulary aggregation (word-frequency pass +
    // piece enumeration + TakeOrdered cut) on every round
    val vp = graft.Tables.materialize(vocab.select(col("piece")))
    // localCheckpoint, NOT cache: each round references the previous
    // state TWICE (candidate explode + rewrite join), so a cache-only
    // loop doubles the logical plan per round — 2^maxChars by the end
    // — and the driver drowns in analysis (the kCore house rule:
    // iterative loops must truncate lineage).
    var st = words
      .select(col("word"), col("wf"))
      .withColumn("pos", lit(0))
      .withColumn("toks", lit(""))
      .withColumn("unk", length(col("word")) > maxChars)
      .localCheckpoint(true)
    for (_ <- 1 to maxChars) {
      val cand = st
        .filter(!col("unk") && col("pos") < length(col("word")))
        .select(col("word"), col("pos"),
          explode(sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - col("pos"))))
            .as("l"))
        .withColumn("piece",
          when(col("pos") === 0, col("word").substr(lit(1), col("l")))
            .otherwise(concat(lit("##"),
              col("word").substr(col("pos") + 1, col("l")))))
      val best = cand.join(broadcast(vp), Seq("piece"))
        .groupBy(col("word")).agg(max(col("l")).as("bl"))
      val active = !col("unk") && col("pos") < length(col("word"))
      val matched = active && col("bl").isNotNull
      val pieceExpr =
        when(col("pos") === 0, col("word").substr(lit(1), col("bl")))
          .otherwise(concat(lit("##"),
            col("word").substr(col("pos") + 1, col("bl"))))
      st = st
        .join(best, Seq("word"), "left_outer")
        .select(col("word"), col("wf"),
          when(matched, col("pos") + col("bl")).otherwise(col("pos"))
            .as("pos"),
          when(matched, when(col("toks") === "", pieceExpr)
              .otherwise(concat(col("toks"), lit(" "), pieceExpr)))
            .otherwise(col("toks")).as("toks"),
          (col("unk") || (active && col("bl").isNull)).as("unk"))
        .localCheckpoint(true)
    }
    st.select(col("word"), col("wf"),
      when(col("unk"), lit("[UNK]")).otherwise(col("toks")).as("pieces"),
      when(col("unk"), lit(1L))
        .otherwise(size(split(col("toks"), " ")).cast("long"))
        .as("n_pieces"))
  }
}
