package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.ext.Dedup

/** A/B attribution for `dedup_ngram_jaccard`'s round-9 wall doubling:
  * decomposes the adaptive-dispatch query into its stages and times
  * each, interleaved over rounds so box noise hits every variant
  * equally. Variants:
  *   shingle — materialize the gram frame only (shared by all paths)
  *   dfreq   — + materialize gram frequencies + Σdf² scalar (the
  *             dispatch overhead the brute path pays but never uses)
  *   brute   — ngramJaccardPairsBrute (no dispatch, r7's plan)
  *   full    — ngramJaccardPairs (dispatch + selected path)
  */
object JaccardAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.warm(spark)
    def docs = Tables(spark, sfDir, "documents")
    def time(label: String, round: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[jab] $label%-8s r$round ${(System.nanoTime() - t0) / 1e9}%7.2fs n=$n")
    }
    for (round <- 1 to 3) {
      time("shingle", round) {
        val g = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
        val n = g.count(); g.unpersist(); n
      }
      time("dfreq", round) {
        val g = Tables.materialize(
          Dedup.shingles(docs, col("doc_id"), col("text"), 3))
        val dfreq = Tables.materialize(
          g.groupBy(col("gram")).agg(count(lit(1)).as("dfr")))
        val v = dfreq.agg(sum(col("dfr").cast("decimal(38,0)") * col("dfr")))
          .collect()(0).getDecimal(0)
        g.unpersist(); dfreq.unpersist(); v.longValue()
      }
      time("brute", round) {
        Dedup.ngramJaccardPairsBrute(docs, col("doc_id"), col("text"),
          3, 0.5).count()
      }
      time("full", round) {
        Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          3, 0.5).count()
      }
    }
    spark.stop()
  }
}
