package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.Router
import graft.queries.CoreQueries

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val uris = Tables(spark, dir, "documents").select(
      concat(lit("gs://bucket/"), col("source"), lit("/"),
        col("doc_id").cast("string"), lit(".parquet")).as("uri"))

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs $r")
    }

    val q = Router.route(uris, CoreQueries.routeConfigs)
      .filter(upper(col("file_type")) === "PARQUET")
    t("analyze")(q.queryExecution.analyzed != null)
    t("optimize")(q.queryExecution.optimizedPlan != null)
    t("plan")(q.queryExecution.executedPlan != null)
    t("execute")(q.count())
    t("execute2")(q.count())
    spark.stop()
  }
}
