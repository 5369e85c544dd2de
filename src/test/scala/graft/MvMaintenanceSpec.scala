package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.MvMaintenance

/** Multi-batch folding + replay idempotence for the incremental
  * summary maintenance — the pieces the (single-file) streaming gate
  * can't exercise. */
class MvMaintenanceSpec extends SparkSpec {

  test("three manual splits fold to the direct aggregate; replay no-ops") {
    val dir = Files.createTempDirectory("mv_maint_spec").toString
    val ev = sf("events").limit(3000).cache()
    ev.count()
    val splits = Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
    splits.zipWithIndex.foreach { case (b, i) =>
      assert(MvMaintenance.mergeBatch(spark, dir, b, i.toLong))
    }
    // replayed batch (restart redelivery) must be a no-op
    assert(!MvMaintenance.mergeBatch(spark, dir, splits(1), 1L))
    assert(MvMaintenance.lastMerged(dir) === 2L)

    val got = MvMaintenance.readSummary(spark, dir)
      .orderBy("event_type").collect().map(_.toString)
    val want = MvMaintenance.summarize(ev)
      .orderBy("event_type").collect().map(_.toString)
    assert(got sameElements want)
  }

  test("crash between summary write and ledger flip: replay re-merges " +
      "against the OLD summary — no double count") {
    val dir = Files.createTempDirectory("mv_maint_crash").toString
    val ev = sf("events").limit(600).cache(); ev.count()
    val b0 = ev.filter(col("event_id") % 2 === 0)
    val b1 = ev.filter(col("event_id") % 2 === 1)
    assert(MvMaintenance.mergeBatch(spark, dir, b0, 0L))
    // simulate the crash: batch 1's versioned summary lands on disk
    // but the process dies BEFORE the ledger flips — exactly what a
    // kill between the two steps leaves behind
    MvMaintenance.summarize(ev) // (any frame) — emulate the orphan dir
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/summary_b1")
    assert(MvMaintenance.lastMerged(dir) === 0L) // ledger still old
    // restart replays batch 1: it must merge against batch 0's
    // summary (the orphan is overwritten), not on top of the orphan
    assert(MvMaintenance.mergeBatch(spark, dir, b1, 1L))
    val got = MvMaintenance.readSummary(spark, dir)
      .orderBy("event_type").collect().map(_.toString)
    val want = MvMaintenance.summarize(ev)
      .orderBy("event_type").collect().map(_.toString)
    assert(got sameElements want)
  }

  test("out-of-order old batch is rejected, newer accepted") {
    val dir = Files.createTempDirectory("mv_maint_spec2").toString
    val ev = sf("events").limit(500)
    assert(MvMaintenance.mergeBatch(spark, dir, ev, 5L))
    assert(!MvMaintenance.mergeBatch(spark, dir, ev, 4L))
    assert(MvMaintenance.mergeBatch(spark, dir, ev, 6L))
    // 5 then 6 merged: counts doubled exactly once
    val n = MvMaintenance.readSummary(spark, dir)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(n === 1000L)
  }

  test("sweep keeps one generation of grace; older dirs and orphans go") {
    val dir = Files.createTempDirectory("mv_sweep_spec").toString
    // orphan from a hypothetical crash between flip and GC
    Files.createDirectories(java.nio.file.Paths.get(dir, "summary_b99"))
    val ev = sf("events").limit(100)
    assert(MvMaintenance.mergeBatch(spark, dir, ev, 0L))
    assert(!Files.exists(java.nio.file.Paths.get(dir, "summary_b99")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "summary_b0")))
    // a lazy reader resolved against b0 survives the NEXT merge (one
    // generation of grace) — the read-before-two-merges contract
    val held = MvMaintenance.readSummary(spark, dir)
    assert(MvMaintenance.mergeBatch(spark, dir, ev, 1L))
    assert(Files.exists(java.nio.file.Paths.get(dir, "summary_b0")))
    assert(held.count() > 0) // backing files still there mid-grace
    assert(MvMaintenance.mergeBatch(spark, dir, ev, 2L))
    assert(!Files.exists(java.nio.file.Paths.get(dir, "summary_b0")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "summary_b1")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "summary_b2")))
    assert(MvMaintenance.readSummary(spark, dir).count() > 0)
  }
}
