package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

import graft.compile.ConfigCompiler
import graft.config.SourceConfig
import graft.sink.EventPoster

/** Streaming pipeline — `run()` (`M/main.py:426-523`) re-expressed on
  * Structured Streaming:
  *
  *  - Pub/Sub file notifications + per-file reads (S1+S5) collapse into
  *    the file stream source: `readStream.parquet(dir)` discovers and
  *    reads newly arrived files natively, exactly-once per file — which
  *    also subsumes the reference's 5-minute URI `Distinct` (A1/W1):
  *    the source never re-reads a seen file. For notification-stream
  *    fidelity (URI strings arriving at-least-once), [[dedupUris]]
  *    reproduces the windowed dedup on an ingestion-time watermark.
  *  - The 10 s window + AddRandomKey + GroupByKey micro-batching
  *    (`M/main.py:506-508`) is the micro-batch trigger itself:
  *    `Trigger.ProcessingTime("10 seconds")` + `foreachBatch`.
  *  - Posting + DLQs run inside `foreachBatch` via [[BatchPipeline.post]]
  *    — no bundle/window re-windowing workaround needed (the
  *    reference's `# FIX` sites, `M/main.py:341-344,415-423`).
  */
object StreamingPipeline {

  /** Processing-time dedup of an at-least-once URI notification stream:
    * tumbling 5-minute scope (`M/main.py:461-463`) on an
    * ingestion-time watermark (the reference windows are
    * processing-time; SURVEY.md §2.9). */
  def dedupUris(uriStream: DataFrame, window: String = "5 minutes"): DataFrame =
    uriStream
      .filter(col("uri").isNotNull)
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", window)
      .dropDuplicatesWithinWatermark("uri")

  /** Source-side rate control: cap how many newly discovered files a
    * single micro-batch ingests. The reference's Pub/Sub feed +
    * 5-minute windowing naturally paces a backfill
    * (`M/main.py:461-462,506`); a file-stream source without a cap
    * instead lands an entire backfill-sized burst in ONE micro-batch —
    * one giant state commit, one giant post. `None` = unpaced. */
  private def paced(spark: SparkSession, schema: StructType, dir: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toLong))
    r.parquet(dir)
  }

  /** One config's streaming transform: file-source scan under the
    * config's prefix dir -> compiled mapping. The caller guarantees
    * every file under `dir` belongs to `cfg`; for a mixed directory
    * shared by several configs use [[transformStreamRouted]]. */
  def transformStream(spark: SparkSession, cfg: SourceConfig, dir: String,
      schema: StructType,
      opts: ConfigCompiler.Options = ConfigCompiler.Options(),
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val input = paced(spark, schema, dir, maxFilesPerTrigger)
    ConfigCompiler.compile(cfg, input, opts).df
  }

  /** One config's streaming transform over a SHARED watch directory:
    * each arriving file is routed first-match-wins against the FULL
    * config list (`RouteFileToConfig`, `M/main.py:37-63,466-495`) and
    * only files whose first match is `cfg` are transformed — so N
    * configs watching one directory map every file exactly once, by
    * exactly its first matching config. The route predicate is the
    * same zero-shuffle when-chain the batch router compiles, applied
    * to `input_file_name()`; Spark prunes non-matching files at the
    * source filter, it never transforms them. */
  def transformStreamRouted(spark: SparkSession, cfg: SourceConfig,
      allConfigs: Seq[SourceConfig], dir: String, schema: StructType,
      opts: ConfigCompiler.Options = ConfigCompiler.Options(),
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val input = paced(spark, schema, dir, maxFilesPerTrigger)
      .filter(graft.operators.Router.firstMatchExpr(
        graft.operators.Router.normalizeFileUri(input_file_name()),
        allConfigs) === cfg.configId)
    ConfigCompiler.compile(cfg, input, opts).df
  }

  /** Wire a compiled stream to the batched/retrying sink + DLQ sinks
    * via foreachBatch. DLQ frames are handed to the caller's writers so
    * tests can collect and production can append to storage (K2/K3 are
    * pluggable topics in the reference, `M/main.py:497-502,519-523`).
    * Posting is materialized inside the callback; delivery is
    * AT-LEAST-ONCE (a lost persist() block or a replayed micro-batch
    * re-posts — downstream dedup is `$insert_id`, same posture as the
    * reference, `M/main.py:272-273`). `writeApiDlq` receives an
    * already-delivered, cached DLQ frame and must consume it
    * synchronously (it is unpersisted when the writer returns).
    *
    * `onCounters` receives the A3 transform counters of every
    * micro-batch (`n_rows`/`n_dlq`/`missing_distinct_id`/
    * `ts_parse_errors`, `M/main.py:145,274-277`) — the streaming twin
    * of `BatchPipeline.BatchCounters.transform`. Computed with one
    * extra aggregation job per micro-batch over the (small) batch
    * frame; pass the default no-op to skip it. */
  def sinkStream(compiled: DataFrame, posterFactory: () => EventPoster,
      writeTransformDlq: DataFrame => Unit,
      writeApiDlq: DataFrame => Unit,
      triggerInterval: String = "10 seconds",
      onCounters: Map[String, Long] => Unit = _ => ()): DataStreamWriter[Row] =
    compiled.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ok = batch.filter(col("error").isNull)
          .select(to_json(struct(col("event"), col("properties")))
            .as("event_json"))
        writeTransformDlq(
          batch.filter(col("error").isNotNull).select("error.*"))
        // Evaluation == delivery for the posting frame — so it is
        // materialized HERE, once per micro-batch in the normal case.
        // Handing the lazy frame to `writeApiDlq` would make delivery
        // depend on the callback's action count: a no-op writer (api
        // DLQ unset) would silently never post, a two-action writer
        // would post twice. The guarantee is AT-LEAST-ONCE, same as the
        // reference's retrying HTTP poster (`M/main.py:350-368`):
        // persist() is non-reliable storage, so on a cluster a lost or
        // evicted cached partition makes the writer's action recompute
        // the posting mapPartitions and re-post that partition's
        // batches. The import endpoint dedups on insert_id, which is
        // why the reference (and this engine) don't pay a reliable
        // checkpoint per 10-second micro-batch to upgrade it.
        val apiDlq = BatchPipeline.post(ok, posterFactory).persist()
        try {
          apiDlq.count() // the posting job; runs once, fills the cache
          writeApiDlq(apiDlq)
        } finally apiDlq.unpersist() // writer threw ⇒ still unpin the cache
        if (batch.columns.contains("_counters")) {
          val row = graft.compile.CompiledEvents(batch).counters.collect()(0)
          onCounters(row.schema.fieldNames.map(n =>
            n -> row.getAs[Number](n).longValue).toMap)
        }
      }
}
