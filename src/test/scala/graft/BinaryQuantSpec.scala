package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** [[Similarity.binarySignWords]] / `hammingWords` — the 1-bit
  * quantization rung: packing invariants (half-words stay inside 32
  * unsigned bits), the self-distance-zero / symmetry contract of the
  * Hamming metric, and the two-stage promise (exact rerank of a
  * Hamming shortlist recovers recall raw Hamming top-k loses) on a
  * clustered fixture where sign bits genuinely separate clusters. */
class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  // 4 clusters x 25 points in 64 dims: cluster c is positive on the
  // 16-dim band [16c, 16c+16) with a small deterministic wobble, so
  // mean-centered sign bits are (mostly) the cluster's band mask.
  private lazy val fixture = {
    val rows = for {
      c <- 0 until 4
      j <- 0 until 25
    } yield {
      val id = (c * 25 + j).toLong
      val v = Array.tabulate(64) { d =>
        val base = if (d / 16 == c) 5.0f else -1.0f
        base + 0.01f * ((d * 7 + j * 3) % 11)
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private lazy val thresholds =
    Similarity.binaryDimThresholds(fixture, $"embedding", 64)

  private lazy val words =
    Similarity.binarySignWords(fixture, $"vec_id", $"embedding", thresholds)
      .cache()

  test("packed half-words stay inside 32 unsigned bits") {
    assert(thresholds.length == 64 && thresholds.forall(_._2 == 100L))
    val bad = words.filter($"w0" < 0L || $"w0" >= (1L << 32) ||
      $"w1" < 0L || $"w1" >= (1L << 32)).count()
    assert(bad == 0L)
    assert(words.count() == 100L)
  }

  test("hamming: zero on self, symmetric, cluster-separating") {
    val a = words.select($"bid".as("ida"), $"w0".as("a0"), $"w1".as("a1"))
    val b = words.select($"bid".as("idb"), $"w0".as("b0"), $"w1".as("b1"))
    val ham = a.join(b, $"ida" <= $"idb")
      .select($"ida", $"idb",
        Similarity.hammingWords($"a0", $"a1", $"b0", $"b1").as("h"))
      .cache()
    assert(ham.filter($"ida" === $"idb" && $"h" =!= 0L).count() == 0L)
    // symmetry is structural (xor commutes); check the separating
    // property instead: within-cluster distance < cross-cluster.
    val labeled = ham.filter($"ida" =!= $"idb")
      .withColumn("same", ($"ida" / 25).cast("int") === ($"idb" / 25).cast("int"))
    val Array(maxIn, minOut) = labeled
      .agg(max(when($"same", $"h")), min(when(!$"same", $"h")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(maxIn < minOut,
      s"within-cluster max $maxIn should beat cross-cluster min $minOut")
  }

  test("exact rerank of a hamming shortlist matches brute-force truth") {
    val truth = Similarity.bruteForceTopK(fixture, $"vec_id", $"embedding",
        fixture.filter($"vec_id" < 8), $"vec_id", $"embedding", 10)
      .select($"query_id", $"nbr_id")
    val q = words.filter($"bid" < 8)
      .select($"bid".as("query_id"), $"w0".as("q0"), $"w1".as("q1"))
    val short = words.select($"bid".as("nbr_id"), $"w0", $"w1")
      .crossJoin(broadcast(q))
      .withColumn("h", Similarity.hammingWords($"w0", $"w1", $"q0", $"q1"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"h".asc, $"nbr_id".asc)))
      .filter($"rank" <= 50)
      .select($"query_id", $"nbr_id")
    val c = Similarity.vectorsWithNorm(fixture, $"vec_id", $"embedding",
      "nbr_id", "cv", "sn_c")
    val qv = Similarity.vectorsWithNorm(fixture.filter($"vec_id" < 8),
      $"vec_id", $"embedding", "query_id", "qv", "sn_q")
    val rerank = c.join(broadcast(short), Seq("nbr_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine",
        graft.functions.VecKernels.vecDotDec($"cv", $"qv").cast("double") /
          ($"sn_c" * $"sn_q"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cosine".desc, $"nbr_id".asc)))
      .filter($"rank" <= 10)
      .select($"query_id", $"nbr_id")
    // a 50-deep shortlist out of 100 vectors with cluster-aligned
    // bits must recover the exact top-10 perfectly here
    assert(truth.except(rerank).count() == 0L)
    assert(rerank.count() == truth.count())
  }
}
