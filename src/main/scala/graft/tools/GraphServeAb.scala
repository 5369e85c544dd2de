package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ext.Similarity

/** A/B: what actually moves `ann_graph_append_serve`'s self_found —
  * the round-15 verdict hypothesized hub-ORPHANED inserts (no base
  * list adopts them) and prescribed forced reverse-adoption; measured
  * at sf0.01 the append delta has ZERO orphans (every insert is
  * adopted by 7-8 updated lists) yet self_found stays 0.86. So the
  * miss is the WALK, not the wiring: serving starts from the
  * smallest-8-ids entry convention while insertion already uses the
  * stratified stride — on a weak-cosine corpus the greedy beam from
  * clustered low-id entries never enters some inserts' neighborhoods.
  * This tool grades the same merged graph + queries under serving
  * entry strategies x hop counts, to pick the recorded convention.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.GraphServeAb"
  */
object GraphServeAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Sessions.warm(spark)
    val emb = Tables(spark, dir, "embeddings")
    val base = emb.filter(col("vec_id") % 10 =!= 9)
    val appended = emb.filter(col("vec_id") % 10 === 9)
    val g = Tables.materialize(Similarity.nnDescent(base,
      col("vec_id"), col("embedding"), k = 8, rounds = 3))
    val delta = Tables.materialize(Similarity.graphAppend(base,
      col("vec_id"), col("embedding"), g, appended, col("vec_id"),
      col("embedding"), k = 8, beam = 16, hops = 3, entries = 8))
    val touched = delta.filter(col("src") === "updated")
      .select(col("node_id")).distinct()
    val merged = Tables.materialize(
      delta.filter(col("src") =!= "dropped")
        .select(col("node_id"), col("nbr_id"))
        .unionByName(g.join(touched, Seq("node_id"), "left_anti")
          .select(col("node_id"), col("nbr_id"))))
    def strat(n: Int): DataFrame = emb.select(col("vec_id").as("cand"))
      .withColumn("r", row_number().over(Window.orderBy(col("cand"))) - 1)
      .crossJoin(broadcast(emb.agg(count(lit(1)).as("cnt"))))
      .filter(pmod(col("r"),
        floor((col("cnt") + lit(n - 1)) / lit(n)).cast("long")) === 0)
      .select(col("cand"))
    // the round-15 smallest-ids convention must be passed EXPLICITLY:
    // since round 16 graphBeamSearch's entriesDf=None default IS the
    // stratified stride, so a None baseline arm would silently compare
    // stratified against stratified
    def smallest(n: Int): DataFrame = emb
      .orderBy(col("vec_id").asc).limit(n)
      .select(col("vec_id").as("cand"))
    def run(tag: String, entriesDf: Option[DataFrame], entries: Int,
        hops: Int, beam: Int = 16): Unit = {
      val walked = Similarity.graphBeamSearch(emb, col("vec_id"),
        col("embedding"), merged, appended, col("vec_id"),
        col("embedding"), k = 10, beam = beam, hops = hops,
        entries = entries, entriesDf = entriesDf)
      val sf = walked.filter(col("rank") === 1 &&
        col("nbr_id") === col("query_id")).count()
      val truth = Similarity.bruteForceTopK(emb, col("vec_id"),
          col("embedding"), appended, col("vec_id"), col("embedding"), 10)
        .select(col("query_id"), col("nbr_id"))
      val hits = walked.select(col("query_id"), col("nbr_id"))
        .join(truth, Seq("query_id", "nbr_id")).count()
      val nq = appended.count()
      println(f"[serve-ab] $tag%-28s self_found ${sf.toDouble / nq}%.3f " +
        f"walk_top10 ${hits.toDouble / (10 * nq)}%.3f")
    }
    run("smallest8_h3 (r15 gate)", Some(smallest(8)), 8, 3)
    run("smallest8_h4", Some(smallest(8)), 8, 4)
    run("strat8_h3", Some(strat(8)), 8, 3)
    run("strat16_h3", Some(strat(16)), 16, 3)
    run("strat16_h4", Some(strat(16)), 16, 4)
    run("strat32_h3", Some(strat(32)), 32, 3)
    run("strat16_h3_b32", Some(strat(16)), 16, 3, beam = 32)
    spark.stop()
  }
}
