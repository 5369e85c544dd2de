package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the DSv2 seam of [[graft.sources.ShardSource]]: partition
  * pruning from pushed shard filters, column pruning reaching the
  * reader, and content determinism. */
class ShardSourceSpec extends SparkSpec {
  import spark.implicits._

  private def shardsDf: DataFrame =
    spark.read.format("graft.sources.ShardSource")
      .option("shards", "8").option("rowsPerShard", "1000").load()

  test("full scan: 8 shards x 1000 rows, 8 planned partitions") {
    val df = shardsDf
    assert(df.count() === 8000L)
    assert(df.rdd.getNumPartitions === 8)
  }

  test("shard equality prunes to ONE planned partition") {
    val df = shardsDf.filter($"shard" === 3)
    assert(df.rdd.getNumPartitions === 1)
    assert(df.count() === 1000L)
    assert(df.agg(min($"id"), max($"id")).as[(Long, Long)].head() ===
      ((3000L, 3999L)))
  }

  test("shard range prunes partitions and plan text shows the push") {
    val df = shardsDf.filter($"shard" >= 2 && $"shard" <= 5)
    assert(df.rdd.getNumPartitions === 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(shard,2)"), plan)
    assert(plan.contains("LessThanOrEqual(shard,5)"), plan)
  }

  test("IN-list pruning") {
    val df = shardsDf.filter($"shard".isin(0, 7))
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 2000L)
  }

  test("column pruning reaches the reader (plan read schema)") {
    val df = shardsDf.select($"id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("read=[id]"), plan)
    assert(df.agg(sum($"id")).as[Long].head() === 8000L * 7999L / 2)
  }

  test("content algebra matches the oracle's range() regeneration") {
    val r = shardsDf.filter($"id" === 4242L)
      .as[(Long, Long, String, Long)].head()
    assert(r === ((4L, 4242L, "k" + (4242 % 97), (4242L * 31) % 1000)))
  }

  test("streaming path paces shards across micro-batches") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val src = s.readStream.format("graft.sources.ShardSource")
      .option("shards", "8").option("rowsPerShard", "100")
      .option("shardsPerTrigger", "2").load()
    val q = src.groupBy().agg(count(lit(1)).as("n"), sum($"id").as("s"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("shard_stream_spec").start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    val r = s.table("shard_stream_spec").collect().head
    assert(r.getLong(0) === 800L)
    assert(r.getLong(1) === 800L * 799L / 2)
    assert(batches >= 4, s"expected >=4 paced batches, got $batches")
  }

  test("streaming restart resumes from the committed offset") {
    import graft.sources.{ShardScan, ShardOffset, ShardSource}
    val scan = new ShardScan(8, 100L, 2, Array.empty, ShardSource.schema)
    val mbs = scan.toMicroBatchStream("unused")
    // simulate a restart: Spark hands back the committed offset
    mbs.deserializeOffset("4")
    val next = mbs.latestOffset().asInstanceOf[ShardOffset]
    assert(next.n === 6L) // resumes pacing from 4, not from 0
    val parts = mbs.planInputPartitions(new ShardOffset(4L), next)
    assert(parts.map(_.asInstanceOf[graft.sources.ShardPartition].shard)
      .toSeq === Seq(4L, 5L))
    // drains to the end and then stops advancing
    assert(mbs.latestOffset().asInstanceOf[ShardOffset].n === 8L)
    assert(mbs.latestOffset().asInstanceOf[ShardOffset].n === 8L)
  }

  test("aggregate pushdown: GROUP BY shard count/min/max plans NO aggregate") {
    val agg = shardsDf.filter($"shard" < 4).groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"val").as("mn"), max($"id").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), plan)
    val got = agg.collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent expectation from the row algebra
    val exp = (0L until 4L).map { s =>
      val vals = (0L until 1000L).map(i => (s * 1000 + i) * 31 % 1000)
      val ids = (0L until 1000L).map(i => s * 1000 + i)
      s -> ((1000L, vals.min, ids.max))
    }.toMap
    assert(got === exp)
  }

  test("aggregate pushdown falls back for unsupported shapes") {
    // SUM and a non-shard grouping are not pushed: Spark aggregates
    val bySum = shardsDf.groupBy($"shard").agg(sum($"val").as("s"))
    assert(bySum.queryExecution.executedPlan.toString
      .contains("HashAggregate"))
    val byKey = shardsDf.groupBy($"key").agg(count(lit(1)).as("n"))
    assert(byKey.queryExecution.executedPlan.toString
      .contains("HashAggregate"))
    // and both still compute correctly through the base scan
    assert(bySum.collect().length === 8)
    assert(byKey.collect().map(_.getLong(1)).sum === 8000L)
  }

  test("limit pushdown caps every task's read; Spark keeps the global cut") {
    val lim = shardsDf.limit(5)
    val plan = lim.queryExecution.executedPlan.toString
    assert(plan.contains("limit=5"), plan)           // reached the scan
    assert(plan.contains("CollectLimit") ||
      plan.contains("GlobalLimit"), plan)            // partial: Spark cuts
    assert(lim.collect().length === 5)
    // id arithmetic is anchored on the stride, not the capped count:
    // each task emits the FIRST rows of its shard
    val ids = shardsDf.filter($"shard" === 2).limit(3)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2000L, 2001L, 2002L))
  }

  test("residual non-shard filters still apply (source is not trusted)") {
    // key filter is NOT pushed; Spark must filter rows post-scan
    val n = shardsDf.filter($"shard" === 1 && $"key" === "k0").count()
    assert(n === shardsDf.filter($"shard" === 1)
      .collect().count(r => r.getString(2) == "k0").toLong)
    assert(n > 0)
  }

  test("isShardFilter accepts exactly the value types shardSurvives " +
      "evaluates — anything else stays residual") {
    import org.apache.spark.sql.sources.{EqualTo, In, LessThan}
    import graft.sources.ShardSource
    assert(ShardSource.isShardFilter(EqualTo("shard", 3L)))
    assert(ShardSource.isShardFilter(LessThan("shard", 5)))
    assert(ShardSource.isShardFilter(In("shard", Array[Any](1L, 2))))
    // unevaluable literal types must NOT be consumed (no-op drop)
    assert(!ShardSource.isShardFilter(EqualTo("shard", "3")))
    assert(!ShardSource.isShardFilter(LessThan("shard", 5.0)))
    assert(!ShardSource.isShardFilter(In("shard", Array[Any](1L, "x"))))
  }
}
