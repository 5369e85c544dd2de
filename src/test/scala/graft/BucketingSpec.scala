package graft

import org.apache.spark.sql.functions._

import graft.ext.Skew

/** Shuffle-avoidance capabilities for repeated big joins:
  * bucketed-table co-location (no Exchange at all) and deterministic
  * salting (hot key scattered over reducers). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate the join: no shuffle exchange") {
    // the warehouse DIRECTORY outlives the in-memory catalog, so a
    // fresh JVM's DROP IF EXISTS is a no-op while the previous run's
    // path still exists and LOCATION_ALREADY_EXISTS rejects the save —
    // clear both the catalog entry and the location
    spark.sql("DROP TABLE IF EXISTS graft_b_fact")
    spark.sql("DROP TABLE IF EXISTS graft_b_dim")
    for (t <- Seq("graft_b_fact", "graft_b_dim")) {
      val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_warehouse/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("key", "payload")
      .write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("graft_b_fact")
    (0L until 100L).map(k => (k, s"d$k")).toDF("key", "attr")
      .write.mode("overwrite").bucketBy(8, "key").sortBy("key")
      .saveAsTable("graft_b_dim")
    val joined = spark.table("graft_b_fact")
      .join(spark.table("graft_b_dim"), "key")
    // matching bucket layouts satisfy the join's distribution
    // requirement — the planner inserts NO shuffle on either side
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(joined.count() == 1000)
  }

  test("partitioned layout: scan prunes non-matching partitions and " +
      "pushes content filters to parquet") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_part_layout").toString
    (1 to 400).map(i => (i.toLong, Seq("en", "de", "fr", "es")(i % 4),
        s"text $i")).toDF("id", "lang", "text")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    // partition pruning: a lang filter becomes a PartitionFilter and
    // only lang=en files are opened — at 100 TB this is the difference
    // between scanning one partition and scanning the corpus
    val pruned = spark.read.parquet(dir).filter($"lang" === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    val opened = pruned.select(input_file_name()).distinct()
      .as[String].collect()
    assert(opened.nonEmpty && opened.forall(_.contains("lang=en")))
    assert(pruned.count() == 100)
    // predicate pushdown: a content filter reaches the parquet reader
    val pushedPlan = spark.read.parquet(dir).filter($"id" > 390)
      .queryExecution.executedPlan.toString
    assert(pushedPlan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,390)"),
      pushedPlan.take(1500))
  }

  test("salted join equals the plain join on a skewed fixture") {
    // 90% of the big side hits one key — the salting target
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i)).toDF("key", "v")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("key", "attr")
    val plain = big.join(dim, "key")
      .groupBy("key", "attr").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val salted = Skew.saltedJoin(big, dim, "key", salts = 8)
      .groupBy("key", "attr").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(salted == plain)
  }
}
