package graft.tools
import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the dedup pipeline: splits
  * doc_dedup_cc's wall into candidates+verify vs the CC fixpoint and
  * prints the round count (r9 at sf0.1: 5.9s candidates, 1.5s CC,
  * 2 rounds, 188 verified pairs — the md5 hashing bill dominates and
  * is shared with the oracle's own definition). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.warm(spark)
    val dir = "/root/testdata/sf0.1"
    def t[T](label: String)(f: => T): T = {
      val s = System.nanoTime; val r = f
      println(f"[ccprobe] $label%-22s ${(System.nanoTime-s)/1e9}%.2fs"); r
    }
    val docs = Tables(spark, dir, "documents")
    val (survivors, verified) = t("candidates+verify") {
      val p = graft.ext.Dedup.dedupSurvivorsAndVerified(
        docs, col("doc_id"), col("text"), 3, 0.8,
        graft.ext.Dedup.DefaultMaxBandBucket, null)
      (p._1.count(), p._2.localCheckpoint(true))
    }
    println(s"[ccprobe] verified pairs: ${verified.count()}")
    var rounds = 0
    val cc = t("cc") {
      graft.ext.Dedup.connectedComponents(verified, onRounds = r => rounds = r)
    }
    t("cc materialize") { cc.count() }
    println(s"[ccprobe] rounds: $rounds")
    spark.stop()
  }
}
