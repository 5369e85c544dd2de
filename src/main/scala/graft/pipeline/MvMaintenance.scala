package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-summary maintenance — the streaming
  * lifecycle around [[graft.plans.MvCatalog]]'s summaries: each
  * micro-batch folds its PARTIAL aggregate into the stored summary
  * (sum-of-sums, min-of-mins — the same algebraic-state merge as
  * `LakeQueries.incrementalAgg`), so the summary a rollup-rewrite
  * serves is maintained by deltas, never by rescanning the fact
  * table.
  *
  * Exactly-once across restarts: Structured Streaming REPLAYS the
  * in-flight batch after a failure, and a blind merge would
  * double-count it — so the merge is guarded by a batch-id ledger
  * (`_last_batch` marker written AFTER the summary commit; a replay
  * of batchId ≤ ledger is a no-op). This is the standard idempotent
  * `foreachBatch` contract; at scale the marker and summary live in
  * one transactional table commit.
  *
  * State is one summary row per group (here: per event_type) — the
  * summary frame is tiny by construction, so the read-merge-overwrite
  * cycle costs one small job per batch regardless of fact size. */
object MvMaintenance {

  /** Per-batch partial: exact counts, cent-unit value sums (BIGINT —
    * see time_weighted_avg's DECIMAL→double seam note), micro
    * min/max. */
  def summarize(batch: DataFrame): DataFrame =
    batch.select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        expr("unix_micros(ts)").as("us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("us")).as("min_us"), max(col("us")).as("max_us"))

  private def ledgerPath(summaryDir: String) =
    Paths.get(summaryDir, "_last_batch")

  def lastMerged(summaryDir: String): Long = {
    val p = ledgerPath(summaryDir)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  /** Fold one micro-batch into the stored summary; a replayed
    * batchId is a no-op (returns false). */
  def mergeBatch(spark: SparkSession, summaryDir: String,
      batch: DataFrame, batchId: Long): Boolean = {
    if (batchId <= lastMerged(summaryDir)) return false
    val partial = summarize(batch)
    val dataDir = s"$summaryDir/summary"
    val merged =
      if (Files.exists(Paths.get(dataDir))) {
        val prev = spark.read.parquet(dataDir)
        // localCheckpoint materializes the merge BEFORE the overwrite
        // deletes the files it was reading — distributed, no collect
        prev.unionByName(partial)
          .groupBy(col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"),
            min(col("min_us")).as("min_us"), max(col("max_us")).as("max_us"))
          .localCheckpoint(true)
      } else partial
    merged.coalesce(1).write.mode("overwrite").parquet(dataDir)
    Files.writeString(ledgerPath(summaryDir), batchId.toString)
    true
  }

  def readSummary(spark: SparkSession, summaryDir: String): DataFrame =
    spark.read.parquet(s"$summaryDir/summary")
}
