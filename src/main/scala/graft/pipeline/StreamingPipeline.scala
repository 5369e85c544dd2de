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

  /** One config's streaming transform: file-source scan under the
    * config's prefix dir -> compiled mapping. */
  def transformStream(spark: SparkSession, cfg: SourceConfig, dir: String,
      schema: StructType,
      opts: ConfigCompiler.Options = ConfigCompiler.Options()): DataFrame = {
    val input = spark.readStream.schema(schema).parquet(dir)
    ConfigCompiler.compile(cfg, input, opts).df
  }

  /** Wire a compiled stream to the batched/retrying sink + DLQ sinks
    * via foreachBatch. DLQ frames are handed to the caller's writers so
    * tests can collect and production can append to storage (K2/K3 are
    * pluggable topics in the reference, `M/main.py:497-502,519-523`).
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
        writeApiDlq(BatchPipeline.post(ok, posterFactory))
        if (batch.columns.contains("_counters")) {
          val row = graft.compile.CompiledEvents(batch).counters.collect()(0)
          onCounters(row.schema.fieldNames.map(n =>
            n -> row.getAs[Number](n).longValue).toMap)
        }
      }
}
