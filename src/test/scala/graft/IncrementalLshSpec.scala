package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.TextFunctions

/** [[graft.ext.Dedup.incrementalLshDedup]] — the persisted-index
  * ingest path must (a) EQUAL the full-corpus pipeline on the union
  * in the steady state it maintains (history deduped, history ids
  * before batch ids), (b) never consult non-candidate history text,
  * (c) emit the kept docs' band rows as the index delta. */
class IncrementalLshSpec extends SparkSpec {
  import spark.implicits._

  private def fps(df: org.apache.spark.sql.DataFrame) =
    df.select(TextFunctions.canonicalFingerprint(col("text")).as("fp"))
      .distinct()

  private def index(df: org.apache.spark.sql.DataFrame) =
    Dedup.minhashBandRows(
      Dedup.shingles(df, col("doc_id"), col("text"), 3))

  test("incremental kept == full-corpus pipeline kept ∩ batch, on " +
      "real docs split at the median id") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val mid = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) / 2
    val historyRaw = docs.filter(col("doc_id") <= mid)
    val batch = docs.filter(col("doc_id") > mid)
    // steady state: the standing corpus is itself already deduped
    val history = historyRaw.join(
      Dedup.dedupPipelineKept(historyRaw, col("doc_id"), col("text"),
        n = 3, jaccardThreshold = 0.8)
        .withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_semi")
    val (kept, _) = Dedup.incrementalLshDedup(batch,
      col("doc_id"), col("text"),
      index(history), history, col("doc_id"), col("text"), fps(history))
    val gotKept = kept.as[Long].collect().toSet
    val fullKept = Dedup.dedupPipelineKept(
        history.unionByName(batch), col("doc_id"), col("text"),
        n = 3, jaccardThreshold = 0.8)
      .as[Long].collect().toSet
    assert(gotKept == fullKept.filter(_ > mid),
      s"incremental diverged from full pipeline on the batch slice")
    assert(gotKept.nonEmpty)
  }

  test("planted semantics: exact dup dies at the fp ledger, near dup " +
      "dies at the index probe, batch-internal smaller id wins, novel " +
      "doc survives; delta = kept docs' band rows") {
    // near dups differ in ONE token out of 40 (Jaccard ≈ 0.93, band
    // miss probability < 2% — and minhash is deterministic, so a
    // passing fixture passes forever)
    val longText = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearText = (1 to 39).map(i => s"w$i").mkString(" ") + " zzz"
    val novel = (1 to 40).map(i => s"n$i").mkString(" ")
    val novelNear = (1 to 39).map(i => s"n$i").mkString(" ") + " qqq"
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, longText))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (11L, nearText),   // near dup of history 2
      (12L, novel),      // novel
      (13L, novelNear))  // near dup of batch 12
      .toDF("doc_id", "text")
    val (kept, delta) = Dedup.incrementalLshDedup(batch,
      col("doc_id"), col("text"),
      index(history), history, col("doc_id"), col("text"), fps(history),
      threshold = 0.5)
    val got = kept.as[Long].collect().toSet
    assert(got == Set(12L), s"kept: $got")
    val deltaIds = delta.select(col("id")).distinct().as[Long]
      .collect().toSet
    assert(deltaIds == Set(12L))
    // delta rows are exactly the kept docs' band rows
    val expect = index(batch.filter(col("doc_id") === 12L))
      .as[(Long, Int, String)].collect().toSet
    assert(delta.as[(Long, Int, String)].collect().toSet == expect)
  }

  test("sequential ingest: batch 2 dedups against batch 1's KEPT docs " +
      "through the updated stores (index delta + fp ledger + corpus)") {
    val t = (1 to 40).map(i => s"h$i").mkString(" ")
    val a = (1 to 40).map(i => s"a$i").mkString(" ")
    val aNear = (1 to 39).map(i => s"a$i").mkString(" ") + " zz"
    val novel = (1 to 40).map(i => s"n$i").mkString(" ")
    val history = Seq((1L, t)).toDF("doc_id", "text")
    val b1 = Seq((10L, a)).toDF("doc_id", "text")
    val b2 = Seq(
      (20L, a),     // exact dup of batch-1 kept 10 -> fp ledger kills it
      (21L, aNear), // near dup of batch-1 kept 10 -> index probe kills it
      (22L, novel)) // novel -> survives
      .toDF("doc_id", "text")
    var corpus = history
    var idx = graft.Tables.materialize(index(history))
    var ledger = fps(history)
    for (b <- Seq(b1, b2)) {
      val (kept, delta) = Dedup.incrementalLshDedup(b,
        col("doc_id"), col("text"), idx, corpus,
        col("doc_id"), col("text"), ledger)
      val keptDocs = b.join(kept.withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left_semi")
      corpus = corpus.unionByName(keptDocs)
      idx = graft.Tables.materialize(idx.unionByName(delta))
      ledger = ledger.unionByName(fps(keptDocs)).distinct()
    }
    val retained = corpus.select(col("doc_id")).as[Long].collect().toSet
    assert(retained == Set(1L, 10L, 22L), s"retained: $retained")
  }

  test("non-candidate history text is never consulted: a history " +
      "frame holding ONLY band-collision candidates yields the same " +
      "kept set") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val mid = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) / 2
    val history = docs.filter(col("doc_id") <= mid)
    val batch = docs.filter(col("doc_id") > mid)
    val idx = graft.Tables.materialize(index(history))
    val full = Dedup.incrementalLshDedup(batch,
      col("doc_id"), col("text"),
      idx, history, col("doc_id"), col("text"), fps(history))
      ._1.as[Long].collect().toSet
    // superset of candidate ids: history band rows colliding with ANY
    // batch band row (survivor filtering only shrinks this)
    val batchBands = index(batch)
    val collided = history.join(
      idx.join(batchBands.select(col("band"), col("bh")).distinct(),
          Seq("band", "bh"), "left_semi")
        .select(col("id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    val restricted = Dedup.incrementalLshDedup(batch,
      col("doc_id"), col("text"),
      idx, collided, col("doc_id"), col("text"), fps(history))
      ._1.as[Long].collect().toSet
    assert(restricted == full,
      "kept set changed when non-candidate history docs were removed")
  }
}
