package graft

import java.nio.file.Files

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Lakehouse layout behaviors the 100 TB deployment leans on, proven
  * at spec scale on the real write/read paths:
  *
  *  - Hive-style `partitionBy` layout + partition PRUNING: a filter
  *    on the partition column must show up as a PartitionFilter (not
  *    a data filter) and the scan must touch only the matching
  *    directory's files;
  *  - dynamic partition overwrite: rewriting ONE partition leaves
  *    sibling partitions' data intact (the incremental-reprocessing
  *    contract);
  *  - `Observation` metrics: pipeline counters collected from the
  *    query itself without a second scan (the DataFrame analog of
  *    the reference's Beam counters, `M/main.py:92-108`).
  */
class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_part").toString
    sf("events").limit(2000)
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.partitionBy("event_type").mode("overwrite").parquet(d)
    d
  }

  test("partition filter prunes to one directory") {
    val all = spark.read.parquet(dir)
    val nParts = all.select($"event_type").distinct().count()
    val df = all.filter($"event_type" === "click")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    val expected = sf("events").limit(2000)
      .filter($"event_type" === "click").count()
    assert(df.collect().length.toLong === expected) // execute THIS plan
    // after execution the scan's numFiles metric reflects pruning:
    // one partition directory's files, not all nParts directories
    // (inputFiles would lie here — it ignores pushed filters; count()
    // would lie too — it re-plans under a fresh QueryExecution)
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = finalPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, finalPlan.toString)
    val numFiles = scans.head.metrics("numFiles").value
    assert(numFiles >= 1 && numFiles < nParts,
      s"expected pruned scan, read $numFiles files over $nParts partitions")
  }

  test("dynamic partition overwrite rewrites only the touched partition") {
    val d = Files.createTempDirectory("graft_dyn").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("id", "p")
      .write.partitionBy("p").mode("overwrite").parquet(d)
    // overwrite ONLY partition a; b must survive
    Seq((9L, "a")).toDF("id", "p")
      .write.partitionBy("p").mode("overwrite").parquet(d)
    val back = s.read.parquet(d).as[(Long, String)].collect().toSet
    assert(back === Set((9L, "a"), (2L, "b"), (3L, "b")))
  }

  test("Observation collects pipeline counters without a second scan") {
    val obs = Observation("route_metrics")
    val df = sf("events")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .filter($"event_type" === "purchase")
    val filtered = df.count()
    val m = obs.get
    assert(m("n_purchases") === filtered)
    assert(m("n_rows") === sf("events").count())
  }
}
