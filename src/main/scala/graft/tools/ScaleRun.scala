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
  * Run: sbt "runMain graft.tools.ScaleRun [--sfs=d1,d2,…] [query…]"
  * (queries default to the ten heaviest gates from the round-16
  * bench; SF dirs come from --sfs, else the SPARK_GRAFT_SF_DIRS
  * env var (comma-separated), else the driver's testdata trio).
  */
object ScaleRun {
  private val DefaultQueries = Seq(
    "dedup_family_compare", "corpus_tokenize_e2e", "ann_graph_diversify",
    "dedup_stage_costs", "corpus_quality_e2e", "substring_dedup",
    "embed_dbscan", "stream_incremental_dedup", "ann_graph_append",
    "doc_dedup_best")

  def main(args: Array[String]): Unit = {
    val sfs = args.collectFirst {
        case a if a.startsWith("--sfs=") =>
          a.stripPrefix("--sfs=").split(",").toSeq
      }
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIRS")
        .map(_.split(",").toSeq))
      .getOrElse(Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
    val qArgs = args.filterNot(_.startsWith("--sfs=")).toSeq
    val queries = if (qArgs.nonEmpty) qArgs else DefaultQueries
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
    // Each gate's driving rows come from the table(s) it actually
    // reads (a registry, not a silent default); a gate absent from
    // the registry prints one exponent row PER candidate table,
    // explicitly labeled, instead of guessing.
    val gateTables = Map(
      "dedup_family_compare" -> Seq("documents"),
      "corpus_tokenize_e2e" -> Seq("documents"),
      "ann_graph_diversify" -> Seq("embeddings"),
      "dedup_stage_costs" -> Seq("documents"),
      "corpus_quality_e2e" -> Seq("documents"),
      "substring_dedup" -> Seq("documents"),
      "embed_dbscan" -> Seq("embeddings"),
      "stream_incremental_dedup" -> Seq("documents"),
      "ann_graph_append" -> Seq("embeddings"),
      "doc_dedup_best" -> Seq("documents"))
    val allTables = Seq("documents", "embeddings")
    val rows = (for (sf <- sfs; t <- allTables)
      yield (sf, t) ->
        spark.read.parquet(s"$sf/$t.parquet").count().toDouble).toMap
    def exp(cLo: Double, cHi: Double, nLo: Double, nHi: Double): String =
      if (nLo == nHi) "    ="
      else if (cLo <= 0 || cHi <= 0) "  NaN"
      else f"${math.log(cHi / cLo) / math.log(nHi / nLo)}%5.2f"
    println("[scale] --- CPU scaling exponents vs INPUT-ROW growth " +
      "(1.0 = linear, 2.0 = quadratic; '=' = same input) ---")
    queries.foreach { name =>
      val (ts, known) = gateTables.get(name) match {
        case Some(t) => (Seq(t), true)
        case None => (allTables.map(Seq(_)), false)
      }
      val c = sfs.map(sf => res((name, sf))._3)
      ts.foreach { tset =>
        val n = sfs.map(sf => tset.map(t => rows((sf, t))).sum)
        val label = tset.mkString("+") +
          (if (known) "" else "?")
        val pairs = sfs.sliding(2).zipWithIndex.map {
          case (Seq(lo, hi), i) =>
            s"e(${lo.split('/').last}->${hi.split('/').last}) " +
              exp(c(i), c(i + 1), n(i), n(i + 1))
        }.mkString("   ")
        println(f"[scale] $name%-28s ($label%-12s) $pairs")
      }
    }
    spark.stop()
  }
}
