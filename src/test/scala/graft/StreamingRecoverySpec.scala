package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpointed restart — the `Trigger.AvailableNow` incremental-batch
  * pattern a 100 TB ingest actually runs: each invocation drains
  * whatever arrived since the last one and exits; the checkpoint +
  * exactly-once file sink guarantee every source file is processed
  * once ACROSS restarts, with no dedup logic in user code. */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def stageFile(df: DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("graft_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(dest))
  }

  test("AvailableNow file sink resumes from checkpoint exactly-once " +
      "across restarts") {
    val root = Files.createTempDirectory("graft_recovery").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    val ev = sf("events").select(col("event_id"), col("event_type"))
    val total = ev.count()
    val halfA = ev.filter(col("event_id") % 2 === 0)
    val halfB = ev.filter(col("event_id") % 2 === 1)
    val schema = ev.schema

    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: only half A exists
    stageFile(halfA, s"$srcDir/a.parquet")
    drain()
    val afterA = spark.read.parquet(s"$root/out")
    assert(afterA.count() == halfA.count())

    // half B lands while the job is DOWN; run 2 resumes from the
    // checkpoint: drains B, does not reprocess A
    stageFile(halfB, s"$srcDir/b.parquet")
    drain()
    val afterB = spark.read.parquet(s"$root/out")
    assert(afterB.count() == total, "every event delivered")
    assert(afterB.select(col("event_id")).distinct().count() == total,
      "no event delivered twice")
  }
}
