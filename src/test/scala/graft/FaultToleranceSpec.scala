package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

import graft.sources.CollectSink

/** The 1000-executor contract at spec scale: task attempts FAIL and
  * the answer must not change.
  *
  *  - a computation whose first attempt throws on one partition is
  *    retried transparently and yields the exact result;
  *  - the DSv2 [[CollectSink]] commit protocol: retried write tasks
  *    never duplicate rows (only one attempt's commit message wins),
  *    and a failed job aborts atomically — nothing becomes visible.
  */
class FaultToleranceSpec extends SparkSpec {
  import spark.implicits._

  test("task retry is transparent to a deterministic computation") {
    val df = spark.range(0, 1000, 1, 8).mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.partitionId() == 3 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected first-attempt failure")
      it
    }
    assert(df.agg(sum($"value")).as[Long].head() === 1000L * 999L / 2)
  }

  test("DSv2 write: retried task does not duplicate committed rows") {
    val id = "retry-once"
    CollectSink.clear(id)
    spark.range(0, 100, 1, 4)
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 2 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected write-task failure")
        it
      }
      .write.format("graft.sources.CollectSink")
      .option("batchId", id).mode("append").save()
    val rows = CollectSink.committed(id).get
    assert(rows.size === 100)
    assert(rows.map(_.head.toLong).sorted === (0L until 100L).toSeq)
    CollectSink.clear(id)
  }

  test("DSv2 write: failing job aborts atomically, nothing visible") {
    val id = "always-fails"
    CollectSink.clear(id)
    intercept[Exception] {
      spark.range(0, 100, 1, 4)
        .mapPartitions { it =>
          if (TaskContext.get().partitionId() == 2)
            throw new RuntimeException("permanent failure")
          it
        }
        .write.format("graft.sources.CollectSink")
        .option("batchId", id).mode("append").save()
    }
    assert(CollectSink.committed(id).isEmpty, "no partial commit")
    assert(CollectSink.wasAborted(id), "abort hook ran")
    CollectSink.clear(id)
  }
}
