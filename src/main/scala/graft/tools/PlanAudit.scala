package graft.tools

import graft.{Sessions, SparkEntry}

/** Prints plan-quality signals (pushed filters, read schemas, join
  * strategies, codegen spans) for the headline queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join_topk", "q5_multijoin", "map_events",
        "doc_dedup_pipeline", "embed_neardup_lsh", "ann_ivf_topk")
    for (name <- names) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"===== $name")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Join") || l.contains("WholeStageCodegen") ||
          l.contains("Exchange") || l.contains("Filter ("))
        .take(20).foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
