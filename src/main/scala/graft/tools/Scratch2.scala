package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.ext.Similarity

object Scratch2 {
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
    val df = Tables(spark, dir, "embeddings")
    val comp = df.select(col("vec_id").as("id"), col("embedding").as("v"))
      .repartition(32)
      .select(col("id"), posexplode(col("v")))
      .select(col("id"), col("pos").as("i"), col("col").cast("double").as("x"))
      .cache()
    t("comp.count")(comp.count())
    val b = Similarity.lshBuckets(df, col("vec_id"), col("embedding"), 8).cache()
    t("buckets.count")(b.count())
    t("buckets.count2")(b.count())
    val pairs = b.as("bx").join(b.as("by"),
        col("bx.bucket") === col("by.bucket") && col("bx.id") < col("by.id"))
      .select(col("bx.id").as("id1"), col("by.id").as("id2")).cache()
    t("pairs.count")(pairs.count())
    val a1 = comp.select(col("id").as("id1"), col("i"), col("x").as("x1"))
    val a2 = comp.select(col("id").as("id2"), col("i"), col("x").as("x2"))
    val dots = pairs.join(a1, "id1").join(a2, Seq("id2", "i"))
      .groupBy(col("id1"), col("id2"))
      .agg(sum((col("x1") * col("x2")).cast("decimal(28,12)")).cast("double").as("dot"))
    t("dots.count")(dots.count())
    t("dots.count2")(dots.count())
    spark.stop()
  }
}
