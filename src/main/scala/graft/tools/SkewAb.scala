package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ext.Skew

/** A/B harness: manual content-salting vs AQE's skew-join split on a
  * hot-key dimension join, so `Skew.saltedJoin`'s continued existence
  * is evidence-based rather than habit.
  *
  * The two mechanisms see different signals:
  *  - AQE OptimizeSkewedJoin splits a sort-merge/shuffled-hash join
  *    partition whose MAP OUTPUT BYTES exceed
  *    `skewedPartitionThresholdInBytes` (and the median x factor) —
  *    it can split even a single hot key, duplicating the other
  *    side's partition into each split.
  *  - Manual salting re-keys on (key, salt(content)) BEFORE the
  *    shuffle, spreading the hot key over `salts` reducers at the
  *    cost of replicating the dimension side `salts` times.
  *
  * Scenario: big fact side with half its rows on ONE key, dimension
  * side too big to broadcast (broadcast disabled to model that), so
  * the join must shuffle. Variants:
  *   plain_default  — AQE on, stock thresholds (256 MB: typically NOT
  *                    tripped at local data sizes — the cluster
  *                    default is tuned for multi-GB partitions)
  *   plain_tuned    — AQE skew thresholds lowered to fire at this
  *                    scale (what a tuned cluster config achieves)
  *   salted_8       — Skew.saltedJoin, 8 salts, AQE untouched
  *
  * Prints wall seconds and the max single-task wall per variant (the
  * straggler signature skew mitigation exists to kill). Run:
  *   sbt -batch "runMain graft.tools.SkewAb"
  */
object SkewAb {

  private def timed(spark: SparkSession, tag: String)(df: => DataFrame): Unit = {
    val listener = new graft.BenchListener
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println(f"[skew-ab] $tag%-14s wall=$dt%7.2fs " +
      f"max_task_cpu=${listener.maxTaskCpuNs.get / 1e9}%6.2fs " +
      f"tasks=${listener.tasks.sum}%5d")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      // model "dimension too big to broadcast" — with broadcast on,
      // neither mechanism is needed (broadcast join has no reducers)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.warm(spark)
    import spark.implicits._

    val nBig = sys.env.getOrElse("SPARK_GRAFT_SKEWAB_ROWS", "12000000").toLong
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_SKEWAB_HOTPCT", "90").toInt
    val nKeys = 1000
    // hotPct% of the fact table on key 0, the rest uniform; a fat
    // payload column makes partition byte sizes meaningful
    val big = spark.range(nBig).select(
      when(col("id") % 100 < hotPct, lit(0))
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys.toLong)))
        .cast("long").as("key"),
      concat(lit("payload_"), col("id"),
        lit("x" * 64)).as("payload"))
    val dim = spark.range(nKeys).select(col("id").as("key"),
      concat(lit("dim_"), col("id")).as("dval"))
    def plain = big.join(dim, "key")
      .groupBy("key").agg(count(lit(1)).as("n"), max(length(col("payload"))))

    def withConf[T](pairs: (String, String)*)(f: => T): T = {
      val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // two rounds: round 1 pays codegen/JIT warmup, round 2 is the
    // steady-state comparison
    for (round <- 1 to 2) {
      timed(spark, s"plain_default/$round")(plain)
      withConf(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2") {
        timed(spark, s"plain_tuned/$round")(plain)
      }
      timed(spark, s"salted_8/$round")(
        Skew.saltedJoin(big, dim, "key", salts = 8)
          .groupBy("key").agg(count(lit(1)).as("n"), max(length(col("payload")))))
    }
    spark.stop()
  }
}
