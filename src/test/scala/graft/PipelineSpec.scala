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
/** Counts delivered events across poster instances (local-mode JVM is
  * shared, so a static counter observes executor-side posts). */
private object PostedEvents {
  val n = new java.util.concurrent.atomic.AtomicLong
}
private class EventCountingPoster extends EventPoster {
  def post(gz: Array[Byte], nEvents: Int): PostResult = {
    PostedEvents.n.addAndGet(nEvents)
    PostResult(200, "ok")
  }
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

  /** Write `rows` as ONE flat parquet file at `target` (the shape GCS
    * notifications deliver — a single object, not a writer directory). */
  private def writeFlatParquet(target: java.nio.file.Path,
      rows: Seq[(String, Long, String)]): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft_flat")
    rows.toDF("event_type", "ts_epoch", "uid")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/out")
    val part = Files.list(java.nio.file.Paths.get(s"$tmp/out"))
      .iterator().asScala
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.toString.endsWith(".parquet")).get
    Files.copy(part, target)
  }

  test("streaming routing: shared watch dir, each file mapped exactly once " +
      "by its first matching config") {
    val watch = Files.createTempDirectory("graft_watch")
    val ckpt = Files.createTempDirectory("graft_watch_ckpt")
    writeFlatParquet(watch.resolve("a_1.parquet"), Seq(("from_a", 10L, "u1")))
    writeFlatParquet(watch.resolve("b_1.parquet"), Seq(("from_b", 20L, "u2")))
    def cfg(id: String, prefix: String) = SourceConfig(
      configId = id, sourcePrefix = prefix,
      eventNameField = Some("event_type"),
      fieldMappings = Seq(
        FieldMapping("ts_epoch", "time", CastType.UnixTimestampAuto),
        FieldMapping("uid", "$user_id", CastType.StringT)))
    // cfgB's prefix matches EVERY file in the dir; first-match-wins must
    // still route a_1.parquet to cfgA only (declaration order).
    val cfgA = cfg("a", s"$watch/a_")
    val cfgB = cfg("b", s"$watch/")
    val all = Seq(cfgA, cfgB)
    val schema = spark.read.parquet(watch.toString).schema
    for (c <- all) {
      val compiled = StreamingPipeline.transformStreamRouted(
        spark, c, all, watch.toString, schema)
      val q = compiled.writeStream.outputMode("append")
        .format("memory").queryName(s"routed_${c.configId}")
        .option("checkpointLocation", s"$ckpt/${c.configId}").start()
      q.processAllAvailable()
      q.stop()
    }
    val aEvents = spark.table("routed_a")
      .select(col("event")).as[String].collect().toSeq
    val bEvents = spark.table("routed_b")
      .select(col("event")).as[String].collect().toSeq
    assert(aEvents == Seq("from_a")) // not from_b: prefix doesn't match
    assert(bEvents == Seq("from_b")) // not from_a: cfgA matched it first
  }

  test("streaming posting is exactly-once regardless of the api-dlq " +
      "writer's action count") {
    // no-op api-dlq writer (the Launcher shape when --dlq_topic_api_errors
    // is unset): delivery must still happen
    val dir1 = writeTempEvents()
    val schema1 = spark.read.parquet(s"$dir1/src/part.parquet").schema
    PostedEvents.n.set(0)
    val q1 = StreamingPipeline.sinkStream(
      StreamingPipeline.transformStream(
        spark, cfgFor(dir1), s"$dir1/src/part.parquet", schema1),
      () => new EventCountingPoster, _ => (), _ => (),
      triggerInterval = "1 seconds")
      .option("checkpointLocation", s"$dir1/ckpt_once").start()
    q1.processAllAvailable()
    q1.stop()
    assert(PostedEvents.n.get == 2L) // both good rows posted, once each
    // double-action writer: must NOT re-post
    val dir2 = writeTempEvents()
    val schema2 = spark.read.parquet(s"$dir2/src/part.parquet").schema
    PostedEvents.n.set(0)
    val q2 = StreamingPipeline.sinkStream(
      StreamingPipeline.transformStream(
        spark, cfgFor(dir2), s"$dir2/src/part.parquet", schema2),
      () => new EventCountingPoster, _ => (),
      api => { api.count(); api.count() },
      triggerInterval = "1 seconds")
      .option("checkpointLocation", s"$dir2/ckpt_twice").start()
    q2.processAllAvailable()
    q2.stop()
    assert(PostedEvents.n.get == 2L)
  }

  test("ledger records only imported files; a corrupt file retries after " +
      "a fixed re-upload") {
    import graft.pipeline.FileLedger
    val dir = writeTempEvents()
    val bad = s"$dir/src/bad.parquet"
    Files.write(java.nio.file.Paths.get(bad), "not a parquet".getBytes)
    val led = s"$dir/led"
    val uris = Seq(s"$dir/src/part.parquet", bad)
    val res = BatchPipeline.run(spark,
      FileLedger.unprocessed(spark, uris, led),
      Seq(cfgFor(dir)), () => new Always200)
    assert(res.imported == Seq(s"$dir/src/part.parquet"))
    assert(res.counters.readErrors == Map("t" -> 1L))
    FileLedger.record(spark, res.imported, led)
    // the corrupt file was NOT recorded: still eligible on the next run
    assert(FileLedger.unprocessed(spark, uris, led) == Seq(bad))
    // fixed re-upload at the same URI imports on the next run
    Files.delete(java.nio.file.Paths.get(bad))
    writeFlatParquet(java.nio.file.Paths.get(bad), Seq(("fixed", 40L, "u4")))
    val res2 = BatchPipeline.run(spark,
      FileLedger.unprocessed(spark, uris, led),
      Seq(cfgFor(dir)), () => new Always200)
    assert(res2.imported == Seq(bad))
    assert(res2.eventsJson.count() == 1)
  }

  test("prefix-scan transform: no driver file list; overlapping prefixes " +
      "routed first-match-wins; subdirs recursed") {
    val dir = Files.createTempDirectory("graft_scan")
    writeFlatParquet(dir.resolve("a_1.parquet"), Seq(("from_a", 10L, "u1")))
    writeFlatParquet(dir.resolve("b_1.parquet"), Seq(("from_b", 20L, "u2")))
    Files.createDirectory(dir.resolve("sub"))
    writeFlatParquet(dir.resolve("sub").resolve("c.parquet"),
      Seq(("from_sub", 30L, "u3")))
    def cfg(id: String, prefix: String) = SourceConfig(
      configId = id, sourcePrefix = prefix,
      eventNameField = Some("event_type"),
      fieldMappings = Seq(
        FieldMapping("ts_epoch", "time", CastType.UnixTimestampAuto),
        FieldMapping("uid", "$user_id", CastType.StringT)))
    // cfgB's prefix contains cfgA's whole subtree; a_1 must still go to
    // cfgA only, and sub/c.parquet reaches cfgB via recursive lookup
    val cfgA = cfg("a", s"$dir/a_")
    val cfgB = cfg("b", s"$dir/")
    val (json, _, obs) = BatchPipeline.transformPrefixScans(
      spark, Seq(cfgA, cfgB))
    val events = json
      .select(get_json_object(col("event_json"), "$.event").as("e"))
      .as[String].collect().sorted.toSeq
    assert(events == Seq("from_a", "from_b", "from_sub")) // once each
    assert(obs("a").get("n_rows") == 1L) // a_1 only
    assert(obs("b").get("n_rows") == 2L) // b_1 + sub/c, NOT a_1
  }

  test("prefix-scan transform: partial-name prefix matches files under a " +
      "prefix-named subdirectory (GCS flat prefix semantics)") {
    // GCS prefix `d/a_` matches BOTH object `d/a_1.parquet` and object
    // `d/a_2024/part.parquet` (flat namespace). The leaf-glob scan must
    // reach the subdirectory file; an unrelated subdirectory stays
    // unread (regression: pathGlobFilter tested leaf names only, so
    // d/a_2024/ was never scanned though Router.route matches it)
    val dir = Files.createTempDirectory("graft_scan_sub")
    writeFlatParquet(dir.resolve("a_1.parquet"), Seq(("flat", 10L, "u1")))
    Files.createDirectory(dir.resolve("a_2024"))
    writeFlatParquet(dir.resolve("a_2024").resolve("part.parquet"),
      Seq(("nested", 20L, "u2")))
    Files.createDirectory(dir.resolve("other"))
    writeFlatParquet(dir.resolve("other").resolve("x.parquet"),
      Seq(("unrelated", 30L, "u3")))
    val cfg = SourceConfig(
      configId = "a", sourcePrefix = s"$dir/a_",
      eventNameField = Some("event_type"),
      fieldMappings = Seq(
        FieldMapping("ts_epoch", "time", CastType.UnixTimestampAuto),
        FieldMapping("uid", "$user_id", CastType.StringT)))
    val (json, _, obs) = BatchPipeline.transformPrefixScans(spark, Seq(cfg))
    val events = json
      .select(get_json_object(col("event_json"), "$.event").as("e"))
      .as[String].collect().sorted.toSeq
    assert(events == Seq("flat", "nested"))
    assert(obs("a").get("n_rows") == 2L)
  }

  test("prefix-scan transform: URI-special characters in paths still " +
      "prefix-match (input_file_name percent-encodes)") {
    val dir = Files.createTempDirectory("graft scan enc") // space in path
    writeFlatParquet(dir.resolve("a+b 1.parquet"), Seq(("enc", 10L, "u1")))
    val cfg = SourceConfig(
      configId = "e", sourcePrefix = s"$dir/a+b",
      eventNameField = Some("event_type"),
      fieldMappings = Seq(
        FieldMapping("ts_epoch", "time", CastType.UnixTimestampAuto),
        FieldMapping("uid", "$user_id", CastType.StringT)))
    // input_file_name() reports .../graft%20scan%20enc.../a+b%201.parquet;
    // without percent-decoding the plain-path prefix never matches and
    // the file is silently dropped
    val (json, _, obs) = BatchPipeline.transformPrefixScans(spark, Seq(cfg))
    assert(json.count() == 1L)
    assert(obs("e").get("n_rows") == 1L)
  }

  test("prefix-scan transform rejects a prefix with no directory part") {
    val bad = SourceConfig("x", "no-slash-anywhere")
    val e = intercept[IllegalArgumentException] {
      BatchPipeline.transformPrefixScans(spark, Seq(bad))
    }
    assert(e.getMessage.contains("no '/'"))
  }

  test("distributed routing: 50k URIs, two passes, exact counts") {
    val cfgs = Seq(
      SourceConfig("a", "gs://b/a/"),
      SourceConfig("n", "gs://b/n/", fileType = "CSV"))
    val uris = (1 to 50000).map { i =>
      if (i % 2 == 0) s"gs://b/a/f$i.parquet"
      else if (i % 5 == 0) s"gs://b/n/f$i.csv"
      else s"gs://b/x/f$i"
    }
    val (routed, counts, unmatched) =
      BatchPipeline.routeFilesDistributed(spark, uris, cfgs)
    assert(routed.keys.map(_.configId) == Set("a")) // parquet configs only
    assert(routed.head._2.size == 25000)
    assert(counts == Map("a" -> 25000L, "n" -> 5000L))
    assert(unmatched == 20000L)
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
