package graft.tools

import graft.{Sessions, SparkEntry}

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.warm(spark)
    val dir = "/root/testdata/sf0.1"

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs $r")
    }

    for (name <- args) {
      val q = SparkEntry.queries(name)(spark, dir)
      t(s"$name/analyze")(q.queryExecution.analyzed != null)
      t(s"$name/optimize")(q.queryExecution.optimizedPlan != null)
      t(s"$name/plan")(q.queryExecution.executedPlan != null)
      t(s"$name/execute")(q.count())
      t(s"$name/execute2")(SparkEntry.queries(name)(spark, dir).count())
    }
    spark.stop()
  }
}
