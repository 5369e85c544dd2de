package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.compile.ConfigCompiler
import graft.config.{CastType, FieldMapping, SourceConfig}
import graft.pipeline.{BatchPipeline, StreamingPipeline}
import graft.sink.{EventPoster, PostResult}

/** Top-level posters: must not capture the (non-serializable) suite. */
private class Always400 extends EventPoster {
  def post(gz: Array[Byte], n: Int): PostResult = PostResult(400, "nope")
}
private class Always200 extends EventPoster {
  def post(gz: Array[Byte], n: Int): PostResult = PostResult(200, "ok")
}

/** End-to-end batch + streaming pipeline specs on real temp parquet. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeTempEvents(): String = {
    val dir = Files.createTempDirectory("graft_pipe").toString
    Seq(("click", 10L, "u1"), ("view", 20L, "u2"), ("", 30L, "u3"))
      .toDF("event_type", "ts_epoch", "uid")
      .write.mode("overwrite").parquet(s"$dir/src/part.parquet")
    dir
  }

  private def cfgFor(dir: String) = SourceConfig(
    configId = "t", sourcePrefix = s"$dir/src/",
    eventNameField = Some("event_type"),
    fieldMappings = Seq(
      FieldMapping("ts_epoch", "time", CastType.UnixTimestampAuto),
      FieldMapping("uid", "$user_id", CastType.StringT)))

  test("batch pipeline: route -> transform -> post with DLQ channels") {
    val dir = writeTempEvents()
    val res = BatchPipeline.run(spark, Seq(s"$dir/src/part.parquet"),
      Seq(cfgFor(dir)), () => new Always200)
    assert(res.eventsJson.count() == 2) // empty event name -> transform DLQ
    assert(res.transformDlq.as[(String, String, String, String)].collect()
      .map(_._1).toSeq == Seq("missing_dynamic_event_name"))
    assert(res.apiDlq.count() == 0)
  }

  test("batch pipeline: API failures surface as per-event DLQ rows") {
    val dir = writeTempEvents()
    val res = BatchPipeline.run(spark, Seq(s"$dir/src/part.parquet"),
      Seq(cfgFor(dir)), () => new Always400)
    val dlq = res.apiDlq.collect()
    assert(dlq.length == 2)
    assert(dlq.forall(_.getAs[String]("reason") == "client_error_400"))
    assert(dlq.forall(_.getAs[String]("response") == "nope"))
  }

  test("batch pipeline: unrouted and non-parquet files are dropped") {
    val dir = writeTempEvents()
    val routed = BatchPipeline.routeFiles(
      Seq(s"$dir/src/part.parquet", s"$dir/other/x.parquet"),
      Seq(cfgFor(dir), SourceConfig("csv", s"$dir/other/", fileType = "CSV")))
    assert(routed.keys.map(_.configId).toSet == Set("t"))
  }

  test("streaming pipeline: file source -> compiled mapping -> sink via foreachBatch") {
    val dir = writeTempEvents()
    val schema = spark.read.parquet(s"$dir/src/part.parquet").schema
    // part.parquet is itself a directory (Spark writer layout) — the
    // file stream source lists non-recursively, so stream that dir
    val compiled = StreamingPipeline.transformStream(
      spark, cfgFor(dir), s"$dir/src/part.parquet", schema)
    var okCount = 0L
    var dlqCount = 0L
    val q = StreamingPipeline.sinkStream(compiled, () => new Always200,
      dlq => dlqCount += dlq.count(),
      api => okCount += api.count(),
      triggerInterval = "1 seconds")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    q.stop()
    assert(dlqCount == 1) // the empty-name row
    assert(okCount == 0)  // Always200 -> no API DLQ
  }

  test("file ledger: processed files are skipped, appends are idempotent") {
    import graft.pipeline.FileLedger
    val ledger = Files.createTempDirectory("graft_ledger").toString + "/led"
    assert(FileLedger.unprocessed(spark, Seq("gs://a/1", "gs://a/2"), ledger)
      == Seq("gs://a/1", "gs://a/2")) // empty ledger passes everything
    FileLedger.record(spark, Seq("gs://a/1", "gs://a/2"), ledger)
    assert(FileLedger.unprocessed(
      spark, Seq("gs://a/1", "gs://a/2", "gs://a/3"), ledger).sorted
      == Seq("gs://a/3"))
    FileLedger.record(spark, Seq("gs://a/2", "gs://a/3"), ledger) // overlap ok
    assert(FileLedger.unprocessed(
      spark, Seq("gs://a/1", "gs://a/2", "gs://a/3"), ledger).isEmpty)
  }

  test("streaming counters surface per micro-batch via foreachBatch") {
    val dir = writeTempEvents()
    val schema = spark.read.parquet(s"$dir/src/part.parquet").schema
    val compiled = StreamingPipeline.transformStream(
      spark, cfgFor(dir), s"$dir/src/part.parquet", schema)
    var counters = Map.empty[String, Long]
    val q = StreamingPipeline.sinkStream(compiled, () => new Always200,
      _ => (), _ => (), triggerInterval = "1 seconds",
      onCounters = m => counters = m.map { case (k, v) =>
        k -> (counters.getOrElse(k, 0L) + v) })
      .option("checkpointLocation", s"$dir/ckpt_counters").start()
    q.processAllAvailable()
    q.stop()
    assert(counters("n_rows") == 3L && counters("n_dlq") == 1L)
  }

  test("streaming dedup: duplicate URIs within the watermark are dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData("gs://a/1", "gs://a/1", "gs://a/2", "gs://a/1")
    val deduped = StreamingPipeline.dedupUris(mem.toDF().toDF("uri"))
    val name = "dedup_test_sink"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).select("uri").as[String].collect().sorted
    assert(got.toSeq == Seq("gs://a/1", "gs://a/2"))
  }
}
