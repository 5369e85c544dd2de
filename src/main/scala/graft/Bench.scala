package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.warm(spark)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink evaluates every output column (count() would let
      // Catalyst prune projection-only queries down to a row count)
      val err =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that cache intermediates must not bleed memory pressure
      // into the next measurement; give the context cleaner a chance to
      // drain before the next timer starts
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
      // a crashed query must not bench as a perf win: sentinel -1
      (name, if (err.isDefined) -1.0 else dt, err)
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }.take(300)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + esc(e) + "\""
    }
    val errJson = if (errs.isEmpty) "" else errs.mkString(",\"errors\":{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir","failed":${errs.size}}""")
    spark.stop()
  }
}
