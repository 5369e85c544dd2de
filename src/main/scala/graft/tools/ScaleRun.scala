package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale spot-run (round-17 verdict ask): the heaviest gates measured
  * across every driver-provided SF (0.001 / 0.01 / 0.1 — a 100×
  * input-size span) with the steal-invariant task/CPU series, plus
  * fitted per-decade scaling exponents e = log10(cpu_hi / cpu_lo)
  * per decade pair. ~1.0 means linear growth, ~2.0 quadratic; the
  * 100 TB plan-shape arguments in SURVEY §2 predict ≈ linear (or
  * n log n) for every family — any gate trending past that gets a
  * plan fix or a weak flag.
  *
  * sf1 is deliberately NOT synthesized: replicating sf0.1 with id
  * offsets duplicates documents/embeddings 10×, which DISTORTS the
  * dedup-family candidate statistics this run exists to measure
  * (identical docs all land in one LSH band → artificial quadratic
  * pair growth; Σdf² dispatch flips). The three real SFs are the
  * honest span.
  *
  * Run: sbt "runMain graft.tools.ScaleRun [query…]"
  * (defaults to the ten heaviest gates from the round-16 bench).
  */
object ScaleRun {
  private val DefaultQueries = Seq(
    "dedup_family_compare", "corpus_tokenize_e2e", "ann_graph_diversify",
    "dedup_stage_costs", "corpus_quality_e2e", "substring_dedup",
    "embed_dbscan", "stream_incremental_dedup", "ann_graph_append",
    "doc_dedup_best")

  def main(args: Array[String]): Unit = {
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val queries = if (args.nonEmpty) args.toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Sessions.warm(spark)
    val listener = new graft.BenchListener
    spark.sparkContext.addSparkListener(listener)
    val all = graft.SparkEntry.queries
    // results(query)(sf) = (wall_s, task_s, cpu_s)
    val res = scala.collection.mutable.Map
      .empty[(String, String), (Double, Double, Double)]
    for (sf <- sfs; name <- queries) {
      val fn = all.getOrElse(name,
        sys.error(s"unknown query $name"))
      listener.reset()
      graft.queries.SharedFrames.drainBuilt()
      val t0 = System.nanoTime()
      val err = try {
        fn(spark, sf).write.mode("overwrite").format("noop").save(); None
      } catch { case e: Throwable => Some(e.getMessage) }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(200)
      val built = graft.queries.SharedFrames.drainBuilt()
      val taskS = listener.taskTimeMs.sum / 1e3
      val cpuS = listener.taskCpuNs.sum / 1e9
      res((name, sf)) = (wall, taskS, cpuS)
      val b = if (built.nonEmpty) built.mkString(" built:[", ",", "]")
        else ""
      println(f"[scale] $name%-28s $sf%-24s wall $wall%8.2f s " +
        f"task $taskS%8.2f s cpu $cpuS%8.2f s$b" +
        err.map(e => s" ERR: $e").getOrElse(""))
    }
    // exponents must be taken against the gate's ACTUAL input growth,
    // not the nominal SF: documents/embeddings are identical at
    // sf0.001 and sf0.01 (500 rows each) and grow 10x/4x at sf0.1 —
    // only the TPC-H tables scale with SF at every step. A same-input
    // pair measures warm-up noise, not growth, and is printed as "=".
    val drivingTable = Map(
      "ann_graph_diversify" -> "embeddings",
      "ann_graph_append" -> "embeddings",
      "embed_dbscan" -> "embeddings").withDefaultValue("documents")
    val rows = (for (sf <- sfs; t <- Seq("documents", "embeddings"))
      yield (sf, t) ->
        spark.read.parquet(s"$sf/$t.parquet").count().toDouble).toMap
    def exp(cLo: Double, cHi: Double, nLo: Double, nHi: Double): String =
      if (nLo == nHi) "    ="
      else if (cLo <= 0 || cHi <= 0) "  NaN"
      else f"${math.log(cHi / cLo) / math.log(nHi / nLo)}%5.2f"
    println("[scale] --- CPU scaling exponents vs INPUT-ROW growth " +
      "(1.0 = linear, 2.0 = quadratic; '=' = same input) ---")
    queries.foreach { name =>
      val t = drivingTable(name)
      val c = sfs.map(sf => res((name, sf))._3)
      val n = sfs.map(sf => rows((sf, t)))
      println(f"[scale] $name%-28s ($t%-10s) " +
        s"e(0.001->0.01) ${exp(c(0), c(1), n(0), n(1))}   " +
        s"e(0.01->0.1) ${exp(c(1), c(2), n(1), n(2))}")
    }
    spark.stop()
  }
}
