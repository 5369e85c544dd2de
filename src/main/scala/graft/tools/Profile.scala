package graft.tools

import graft.{Sessions, SparkEntry}

/** Scratch profiler: runs each registered query twice in one session to
  * separate codegen/session warmup from steady-state cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.warm(spark)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names; round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name%-24s r$round ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    spark.stop()
  }
}
