package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Seed-cell vs trained-cell residual IVF-PQ recall A/B, off the gate
  * fixture's query band — the attribution tool behind
  * `ann_residual_recall_audit`'s honest-null scaladoc. The gate's
  * queries (vec_id < 10) are THEMSELVES seed centroids (the seed
  * convention takes the 16 smallest-id corpus vectors), so the gated
  * seed number rides a query-centering artifact: each query's own
  * cell has a near-zero residual and an exact coarse term. Running
  * the same A/B over query bands that are NOT seed ids separates
  * that artifact from the data question (is there coarse structure
  * for Lloyd's to find?).
  *
  * Usage: `runMain graft.tools.ResidualAb [sfDir] [bandStart ...]` —
  * defaults to /root/testdata/sf0.01 with bands 0 and 100. Prints one
  * line per band: seed/trained/flat hits of (10 queries × k=10).
  */
object ResidualAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val bands =
      if (args.length > 1) args.drop(1).map(_.toLong).toSeq else Seq(0L, 100L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Sessions.warm(spark)
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val trainedCent = Similarity.kmeansCentroids(emb, col("vec_id"),
      col("embedding"), numCells = 16, iters = 3, sampleMod = 4)
    bands.foreach { b =>
      val q = emb.filter(col("vec_id") >= b && col("vec_id") < b + 10)
      val truth = graft.Tables.materialize(
        Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
            q, col("vec_id"), col("embedding"), 10)
          .select(col("query_id"), col("nbr_id")))
      def hits(top: DataFrame): Long =
        top.select(col("query_id"), col("nbr_id"))
          .join(truth, Seq("query_id", "nbr_id"), "left_semi").count()
      def resid(cent: Option[DataFrame]): DataFrame =
        Similarity.ivfPqResidualTopK(emb, col("vec_id"), col("embedding"),
          q, col("vec_id"), col("embedding"), k = 10, numCells = 16,
          nProbe = 4, m = 16, ksub = 64, iters = 2, sampleMod = 1,
          centroids = cent)
      println(s"[residual-ab] band=$b seed=${hits(resid(None))} " +
        s"trained=${hits(resid(Some(trainedCent)))} of 100")
    }
    spark.stop()
  }
}
