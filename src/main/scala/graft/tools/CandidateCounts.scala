package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Empirical CANDIDATE-ROW certification for the banded/blocked
  * generators (round-18 verdict ask): the scale posture of every
  * dedup/ANN family rests on "candidates are banded, blocked, or
  * list-bounded — never corpus²"; this tool MEASURES each family's
  * candidate volume at two real SFs next to its analytic plan-shape
  * bound, and prints measured-vs-input growth so SURVEY can record
  * certified numbers instead of plan-shape claims alone.
  *
  * Families and bounds:
  *  - lsh_pairs      measured = MinHash-LSH candidate pairs;
  *                   bound = Σ_buckets C(sz, 2) over band buckets
  *  - winnow_pairs   measured = winnowing shared-fingerprint pairs;
  *                   bound = Σ C(sz, 2) over kept (df ≤ 64) buckets
  *  - embed_pairs    measured = hyperplane-LSH bucket-join CANDIDATE
  *                   pairs (threshold −1 disables the cosine verify,
  *                   so the count IS the candidate volume; cap 1000);
  *                   no closed-form bound — growth row only
  *  - graph_occl     measured = occlusion candidate pairs of the
  *                   serving store build (node × higher-ranked);
  *                   bound = n · k(k−1)/2 at k = 16
  *  - del_bridge     measured = delete-stage bridge candidate rows at
  *                   the gate band (%10 = 4 over the diversified
  *                   store); bound = holes · k (each deleted member
  *                   contributes its own ≤ k list)
  *
  * Run: sbt "runMain graft.tools.CandidateCounts [--sfs=d1,d2]"
  * (defaults to sf0.01,sf0.1 — the only pair with real input
  * growth; see TESTDATA note in SURVEY round-17). */
object CandidateCounts {
  def main(args: Array[String]): Unit = {
    val sfs = args.collectFirst {
        case a if a.startsWith("--sfs=") =>
          a.stripPrefix("--sfs=").split(",").toSeq
      }
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIRS")
        .map(_.split(",").toSeq))
      .getOrElse(Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Sessions.warm(spark)

    // (family, sf) -> (measured, bound, inputRows); bound < 0 = none
    val res = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (Long, Long, Long)]

    def choose2(c: org.apache.spark.sql.Column) = c * (c - 1) / 2
    def scalar(df: DataFrame): Long = {
      val r = df.collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

    for (sf <- sfs) {
      val docs = graft.Tables(spark, sf, "documents")
      val emb = graft.Tables(spark, sf, "embeddings")
      val nDocs = docs.count()
      val nEmb = emb.count()

      val sh = graft.Tables.materialize(
        Dedup.shingles(docs, col("doc_id"), col("text"), 3))
      val lshMeasured =
        Dedup.minhashLshPairsFromShingles(sh).count()
      val lshBound = scalar(Dedup.minhashBandRows(sh)
        .groupBy(col("band"), col("bh"))
        .agg(count(lit(1)).as("sz"))
        .agg(sum(choose2(col("sz"))).cast("long")))
      res(("lsh_pairs", sf)) = (lshMeasured, lshBound, nDocs)

      val winMeasured = Dedup.winnowPairs(docs, col("doc_id"),
        col("text")).count()
      val winBound = scalar(
        Dedup.winnowFingerprints(docs, col("doc_id"), col("text"))
          .select(col("doc_id"), col("fp_hash")).distinct()
          .groupBy(col("fp_hash")).agg(count(lit(1)).as("sz"))
          .filter(col("sz") <= 64)
          .agg(sum(choose2(col("sz"))).cast("long")))
      res(("winnow_pairs", sf)) = (winMeasured, winBound, nDocs)

      val embMeasured = Similarity.lshNearDupPairs(emb, col("vec_id"),
        col("embedding"), dim = 64, threshold = -1.0).count()
      res(("embed_pairs", sf)) = (embMeasured, -1L, nEmb)

      // the remedy demonstrated: hold bucket OCCUPANCY constant by
      // scaling numPlanes with log2(n) (bucket count 2^planes ∝ n)
      // — candidate growth should read ~linear where the fixed-plane
      // row above reads ~quadratic
      val planes = math.max(4,
        math.ceil(math.log(nEmb / 2.0) / math.log(2.0)).toInt)
      val embScaled = Similarity.lshNearDupPairs(emb, col("vec_id"),
        col("embedding"), dim = 64, numPlanes = planes,
        threshold = -1.0).count()
      res(("embed_pairs_pl", sf)) = (embScaled, -1L, nEmb)

      val store = graft.Tables.materialize(
        Similarity.nnDescent(emb, col("vec_id"), col("embedding"),
          k = 16, rounds = 4))
      val occlMeasured = store.as("x").join(store.as("y"),
        col("x.node_id") === col("y.node_id") &&
          col("y.rank") < col("x.rank")).count()
      res(("graph_occl", sf)) = (occlMeasured, nEmb * 16 * 15 / 2, nEmb)

      // delete-stage bridge pool at the gate band over the
      // diversified store — the deleteStageCtes `_brn` volume
      val dg = graft.Tables.materialize(
        Similarity.diversifyGraph(emb, col("vec_id"),
          col("embedding"), store, degree = 8))
      val del = emb.filter(col("vec_id") % 10 === 4)
        .select(col("vec_id").as("del_id"))
      val gKeep = dg.join(del.select(col("del_id").as("node_id")),
        Seq("node_id"), "left_anti")
      val holeEdges = graft.Tables.materialize(
        gKeep.join(del.select(col("del_id").as("nbr_id")),
          Seq("nbr_id"), "left_semi"))
      val nHoles = holeEdges.count()
      val bridgeMeasured = holeEdges
        .select(col("node_id"), col("nbr_id").as("mid"))
        .join(dg.select(col("node_id").as("mid"),
          col("nbr_id").as("cand")), "mid")
        .count()
      res(("del_bridge", sf)) = (bridgeMeasured, nHoles * 8, nEmb)
      spark.catalog.clearCache()
    }

    println("[cand] family         sf                        " +
      "measured      bound      input")
    for (((fam, sf), (m, b, n)) <- res) {
      val bs = if (b < 0) "         -" else f"$b%10d"
      println(f"[cand] $fam%-14s $sf%-24s $m%10d $bs $n%10d")
    }
    println("[cand] --- growth: e = log(m_hi/m_lo)/log(n_hi/n_lo) " +
      "(1.0 linear, 2.0 quadratic) ---")
    val fams = res.keys.map(_._1).toSeq.distinct
    for (fam <- fams; Seq(lo, hi) <- sfs.sliding(2)) {
      val (mLo, _, nLo) = res((fam, lo))
      val (mHi, _, nHi) = res((fam, hi))
      val e =
        if (nLo == nHi || mLo <= 0 || mHi <= 0) Double.NaN
        else math.log(mHi.toDouble / mLo) / math.log(nHi.toDouble / nLo)
      println(f"[cand] $fam%-14s e($lo%s -> $hi%s) = $e%5.2f")
    }
    spark.stop()
  }
}
