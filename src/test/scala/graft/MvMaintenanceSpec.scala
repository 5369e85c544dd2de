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
}
