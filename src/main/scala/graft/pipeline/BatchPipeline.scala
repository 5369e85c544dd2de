package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.ConfigCompiler
import graft.config.SourceConfig
import graft.sink.{EventBatchSink, EventPoster, SinkDlqRecord}

/** Batch backfill pipeline — `run_batch()` (`M/main_batch.py:431-503`)
  * re-expressed Spark-first:
  *
  * reference shape: glob -> MatchAll -> route -> CoGroupByKey join ->
  * per-file iter_batches read -> MapEvents -> post.
  *
  * Spark shape: the file<->config join disappears — configs route FILES
  * (a tiny driver-side list), each config's files are read with ONE
  * vectorized `spark.read.parquet(paths*)` scan (predicate pushdown +
  * column pruning intact), and the per-row mapping is the compiled
  * projection. Only the posting stage repartitions (the analog of the
  * reference's AddRandomKey fan-out).
  */
object BatchPipeline {

  /** The three output channels (§2.8, §2.2): delivered events are
    * side-effected by the sink; DLQs are data. */
  final case class Result(
      eventsJson: DataFrame,
      transformDlq: DataFrame,
      apiDlq: DataFrame)

  /** Route a file list to configs driver-side (first-match-wins,
    * PARQUET-only — P2+P3). */
  def routeFiles(uris: Seq[String], configs: Seq[SourceConfig])
      : Map[SourceConfig, Seq[String]] =
    uris.flatMap { uri =>
      configs.find(c => uri.startsWith(c.sourcePrefix)).map(_ -> uri)
    }
      .groupBy(_._1)
      .collect { case (cfg, pairs) if cfg.isParquet => cfg -> pairs.map(_._2) }
      .toMap

  /** Build the transform stage: per-config compiled mapping over one
    * vectorized scan each; event JSON + transform-DLQ frames unioned
    * across configs (both have config-independent schemas). */
  def transform(spark: SparkSession, routed: Map[SourceConfig, Seq[String]],
      opts: ConfigCompiler.Options = ConfigCompiler.Options())
      : (DataFrame, DataFrame) = {
    val parts = routed.toSeq.sortBy(_._1.configId).map { case (cfg, paths) =>
      val input = spark.read.parquet(paths: _*)
      val compiled = ConfigCompiler.compile(cfg, input, opts)
      (compiled.json, compiled.dlq)
    }
    parts.map(_._1).reduceOption(_ union _)
      .getOrElse(emptyJson(spark)) ->
      parts.map(_._2).reduceOption(_ union _).getOrElse(emptyDlq(spark))
  }

  /** Posting stage: distributed batched/retrying sink; returns the API
    * DLQ as a DataFrame. `parallelism` is the analog of the reference's
    * 5000-key fan-out (`M/main.py:296-303`) — size it to the cluster,
    * not to 5000. */
  def post(eventsJson: DataFrame, posterFactory: () => EventPoster,
      parallelism: Int = 0): DataFrame = {
    val spark = eventsJson.sparkSession
    import spark.implicits._
    val fanned =
      if (parallelism > 0) eventsJson.repartition(parallelism) else eventsJson
    fanned.select(col("event_json")).as[String].mapPartitions { it =>
      val sink = new EventBatchSink(posterFactory())
      val dlq = it.flatMap(e => sink.add(e)) ++ sink.flush()
      dlq.map(d => (d.reason, d.response, d.payload))
    }.toDF("reason", "response", "payload")
  }

  /** Full pipeline: route -> transform -> post. */
  def run(spark: SparkSession, uris: Seq[String], configs: Seq[SourceConfig],
      posterFactory: () => EventPoster,
      opts: ConfigCompiler.Options = ConfigCompiler.Options(),
      postParallelism: Int = 0): Result = {
    val (json, dlq) = transform(spark, routeFiles(uris, configs), opts)
    Result(json, dlq, post(json, posterFactory, postParallelism))
  }

  private def emptyJson(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[String].toDF("event_json")
  }

  private def emptyDlq(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(String, String, String, String)]
      .toDF("error_type", "config_id", "source_field", "original_row")
  }
}
