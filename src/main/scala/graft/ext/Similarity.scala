package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths, mirroring what a 100 TB ANN pipeline needs:
  *  - brute-force cosine top-k: exact baseline; the query side is tiny
  *    and broadcast, so the big side streams through one codegen'd
  *    projection — no shuffle of the corpus.
  *  - random-hyperplane LSH buckets: each vector gets a small bucket id
  *    from the signs of `numPlanes` deterministic hyperplane dots;
  *    bucketing turns the all-pairs problem into per-bucket joins
  *    (shuffle O(vectors), compare O(bucket²)).
  *
  * Numeric determinism (for the DuckDB oracle): dot products fold
  * per-component products (computed exactly in DOUBLE) into an exact
  * DECIMAL(28,12) sum, so no engine's accumulation order can change the
  * result; norms/cosines derive from those sums with IEEE-deterministic
  * sqrt/div. Hyperplane weights are md5-derived integers — the same
  * values are reproducible in SQL (`('0x'||substr(md5(j||'_'||i),1,8))
  * ::BIGINT % 2001 - 1000`).
  */
object Similarity {

  private val Dec = "decimal(28,12)"

  /** Exact decimal fold of sum(a[i]*b[i]); components widened to double
    * before multiplying (float*float in double is exact). */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(0).cast(Dec),
      (acc, v) => (acc + v).cast(Dec))

  /** Exact decimal squared L2 norm. */
  def norm2Exact(a: Column): Column = dotExact(a, a)

  /** Cosine similarity with the deterministic structure
    * dot / (sqrt(n2a) * sqrt(n2b)). */
  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b).cast("double") /
      (sqrt(norm2Exact(a).cast("double")) * sqrt(norm2Exact(b).cast("double")))

  /** Brute-force cosine top-k: for each query vector (small frame,
    * broadcast), the k nearest corpus vectors. Deterministic tie-break
    * on corpus id. */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms once per vector, not once per pair
    val c = corpus.select(corpusId.as("nbr_id"), corpusVec.as("cvec"))
      .withColumn("sn_c", sqrt(norm2Exact(col("cvec")).cast("double")))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qvec"))
      .withColumn("sn_q", sqrt(norm2Exact(col("qvec")).cast("double")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine",
        dotExact(col("cvec"), col("qvec")).cast("double") /
          (col("sn_c") * col("sn_q")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("rank"), col("cosine"))
  }

  /** Deterministic hyperplane weight for (plane, dim): md5-derived
    * integer in [-1000, 1000]. Computed driver-side; folded into the
    * plan as literals. */
  def planeWeight(plane: Int, dim: Int): Long = {
    val mdhex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$dim".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(mdhex, 16) % 2001L - 1000L
  }

  /** Sign-of-dot for one hyperplane: exact decimal sum of w_i * x_i. */
  private def planeSign(vec: Column, plane: Int, dim: Int): Column = {
    val weights = array((0 until dim).map(i => lit(planeWeight(plane, i))): _*)
    val dot = aggregate(
      zip_with(vec, weights, (x, w) => (x.cast("double") * w).cast(Dec)),
      lit(0).cast(Dec),
      (acc, v) => (acc + v).cast(Dec))
    dot >= 0
  }

  /** LSH bucket id: numPlanes sign bits packed into a long. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int = 8): Column =
    (0 until numPlanes).map { j =>
      when(planeSign(vec, j, dim), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed near-duplicate pairs: exact cosine >= threshold, but only
    * for pairs sharing an LSH bucket — the scale path for
    * embedding-cosine dedup (per-bucket self-join instead of all
    * pairs). */
  def lshNearDupPairs(df: DataFrame, id: Column, vec: Column, dim: Int,
      numPlanes: Int = 8, threshold: Double = 0.9): DataFrame = {
    val b = df.select(id.as("id"), vec.as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, numPlanes))
      .withColumn("sn", sqrt(norm2Exact(col("v")).cast("double")))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .withColumn("cosine",
        dotExact(col("x.v"), col("y.v")).cast("double") /
          (col("x.sn") * col("y.sn")))
      .filter(col("cosine") >= threshold)
      .select(col("x.id").as("id1"), col("y.id").as("id2"), col("cosine"))
  }
}
