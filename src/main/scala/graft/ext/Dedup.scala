package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, in increasing
  * scalability order:
  *
  *  - exact:        hash-groupBy on content — one shuffle.
  *  - n-gram Jaccard: exact shingle-set similarity via a shingle
  *    self-join — quadratic in bucket size, the correctness baseline.
  *  - MinHash+LSH:  signature bands bucket the join so only candidate
  *    pairs meet — the 100 TB path (shuffle volume O(docs×bands), not
  *    O(docs²)).
  *  - SimHash:      one 32-bit sketch per doc; near-dups share the
  *    sketch (or a band of it) — cheapest, coarsest.
  *
  * Hash primitive is [[TextFunctions.hash32]]/md5 so every stage is
  * reproducible in the DuckDB oracle (no engine-private hash).
  */
object Dedup {

  /** Exact dedup: keep one representative row per exact `key` (min of
    * `keep` makes the choice deterministic). */
  def exactDedup(df: DataFrame, key: Column, keep: Column): DataFrame =
    df.groupBy(key.as("dedup_key")).agg(min(keep).as("kept"))

  /** Word shingles (n-grams of tokens) as a distinct-exploded frame:
    * (id, gram). The base relation for Jaccard and MinHash. */
  def shingles(df: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame = {
    val toks = TextFunctions.tokens(text)
    // grams[i] = tokens[i..i+n-1], for i in 1..len-n+1 (slice is 1-based)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())
    df.select(id.as("id"), explode(array_distinct(grams)).as("gram"))
  }

  /** Exact n-gram Jaccard similarity for all pairs with
    * `jaccard >= threshold`. Shingle self-join: |A∩B| from the gram
    * equi-join, |A∪B| = |A|+|B|-|A∩B|. Integer counts divided at the
    * end — bit-identical across engines. */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val g = shingles(df, id, text, n).cache()
    val sizes = g.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = g.as("a").join(g.as("b"), col("a.gram") === col("b.gram"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** MinHash signature: numHashes independent min-hashes per doc, where
    * hash_j(gram) = md5(j || ' ' || gram) and "min" is lexicographic on
    * the hex string — a valid permutation family that is portable to
    * any engine with md5. Output: (id, sig_0 … sig_{k-1}). */
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 16): DataFrame = {
    val g = shingles(df, id, text, n)
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(j.toString), lit(" "), col("gram")))).as(s"sig_$j"))
    g.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH candidate pairs: split the signature into bands of
    * `rowsPerBand`, hash each band, and emit pairs that collide in at
    * least one band. Scales as O(docs × bands) shuffle, never O(docs²):
    * the band-explode + groupBy replaces the all-pairs join. */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column,
      n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sig = minhashSignatures(df, id, text, n, numHashes)
    val numBands = numHashes / rowsPerBand
    val bands = array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*))
          .as("bh"))
    }: _*)
    val exploded = sig.select(col("id"), explode(bands).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    exploded.as("x").join(exploded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
  }

  /** SimHash sketch: 32-bit majority-vote over token hash bits.
    * bit i of the sketch = 1 iff more tokens have bit i set than not
    * (ties -> 1, since +0 >= 0). Near-duplicate docs differ in few
    * bits. One groupBy over exploded tokens; integer math only. */
  def simhash(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("id"),
      explode(TextFunctions.tokens(text)).as("tok"))
      .withColumn("h", TextFunctions.hash32(col("tok")))
    val bitVotes = (0 until 32).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v_$i")
    }
    val voted = tok.groupBy(col("id")).agg(bitVotes.head, bitVotes.tail: _*)
    val sketch = (0 until 32).map { i =>
      when(col(s"v_$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col("id"), sketch.as("simhash"))
  }
}
