package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

import graft.{Sessions, SparkEntry}

/** Per-STAGE task-CPU attribution for one query: runs the named
  * queries (each twice — the second run is the steady-state number)
  * and prints the top stages by summed task CPU with their callsites,
  * so a 300-CPU-s query names the operator that burns it.
  * Usage: `runMain graft.tools.StageProfile <query> [query...]` */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProfile <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.warm(spark)
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val cpu = new java.util.concurrent.ConcurrentHashMap[Int, LongAdder]()
    val run = new java.util.concurrent.ConcurrentHashMap[Int, LongAdder]()
    val cnt = new java.util.concurrent.ConcurrentHashMap[Int, LongAdder]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        // first graft.* frames from the callsite stack — the stage
        // name itself is the async-execution anonfun, useless
        val g = e.stageInfo.details.linesIterator
          .filter(l => l.contains("graft.") && !l.contains("StageProfile"))
          .take(3).map(_.trim.stripPrefix("at ").takeWhile(_ != ')') + ")")
          .mkString(" <- ")
        names.put(e.stageInfo.stageId,
          if (g.nonEmpty) g.take(220)
          else e.stageInfo.name.takeWhile(_ != '\n').take(140))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          cpu.computeIfAbsent(e.stageId, _ => new LongAdder)
            .add(m.executorCpuTime)
          run.computeIfAbsent(e.stageId, _ => new LongAdder)
            .add(m.executorRunTime)
          cnt.computeIfAbsent(e.stageId, _ => new LongAdder).add(1)
        }
      }
    })
    for (q <- args; round <- 1 to 2) {
      names.clear(); cpu.clear(); run.clear(); cnt.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // listener drain
      import scala.jdk.CollectionConverters._
      val rows = cpu.asScala.toSeq.map { case (sid, c) =>
        (sid, c.sum / 1e9, run.get(sid).sum / 1e3, cnt.get(sid).sum,
          names.getOrDefault(sid, "?"))
      }.sortBy(-_._2)
      val totCpu = rows.map(_._2).sum
      val totTasks = rows.map(_._4).sum
      println(f"[stageprof] ===== $q r$round wall=$dt%.1fs " +
        f"stageCpu=$totCpu%.1fs stages=${rows.size} tasks=$totTasks")
      rows.take(25).foreach { case (sid, c, r, n, nm) =>
        println(f"[stageprof]  s$sid%-5d cpu=$c%8.2fs run=$r%8.1fs tasks=$n%5d  $nm")
      }
    }
    spark.stop()
  }
}
