package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Model-scoring seam for text-quality classifiers — the contract a
  * fastText-style (or any native/JNI) quality model plugs into, built
  * exactly like [[Multimodal.MediaDecoder]]'s codec seam: the Spark
  * side (schema, per-partition lifecycle, batch shape, ordering) is
  * real and tested; the MODEL IS A STUB because this container ships
  * no classifier weights.
  *
  * Production swap-in: implement [[TextScorer]] so the constructor (or
  * first `scoreBatch`) loads the model ONCE per partition — e.g. mmap
  * a fastText `.bin` from an executor-local path or init a JNI/ONNX
  * session — then let `scoreBatch` run the whole batch through one
  * native inference call. The per-partition instance + batched calls
  * are what amortize model load and FFI crossings at 100 TB; a per-row
  * UDF would pay both per row.
  *
  * Reference scope note: the reference pipeline (`M/main.py`) does no
  * content scoring; this seam is part of the extended training-data
  * surface (quality filtering before sampling/packing). */
object Scoring {

  final case class ScoredDoc(doc_id: Long, score: Double, label: String)

  /** Per-partition batched scorer contract: instantiated once per
    * partition inside `mapPartitions` (the model-handle lifecycle);
    * `scoreBatch` must return exactly one (score, label) per input, in
    * input order. */
  trait TextScorer extends Serializable {
    def scoreBatch(texts: Seq[String]): Seq[(Double, String)]
  }

  /** STUB scorer: deterministic pseudo-probability from the md5 of the
    * UTF-8 bytes, divided by 2^32 — a dyadic division, so the double
    * is bit-exact and the DuckDB oracle reproduces it verbatim (same
    * trick as [[Multimodal.FakeDecoder]]'s pseudo-dimensions). Label
    * is a keep/drop threshold at `threshold`. Clearly NOT a quality
    * model — it exists so the full scoring pipeline (batching,
    * lifecycle, ordering, schema) stays oracle-gateable. */
  final class StubScorer(threshold: Double = 0.5) extends TextScorer {
    def scoreBatch(texts: Seq[String]): Seq[(Double, String)] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      texts.map { t =>
        md.reset()
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_))
          .mkString
        val s = java.lang.Long.parseLong(hex.take(8), 16).toDouble /
          4294967296.0
        (s, if (s >= threshold) "keep" else "drop")
      }
    }
  }

  /** fastText-SHAPED scorer: a linear model over hashed token buckets
    * — the real architecture of fastText-class quality classifiers
    * (hash token → bucket, sum bucket weights, normalize) — with
    * deterministic TOY weights so the gate can hash it cross-engine:
    * bucket = md5-top-32(token) mod `buckets`, weight(b) =
    * (b·2654435761 mod 2003) − 1001 ∈ [−1001, 1001], score =
    * Σweights / (1001·n_tokens) ∈ [−1, 1]. All integer arithmetic
    * until ONE double division of exact operands — bit-identical in
    * the DuckDB oracle. Tokenization is exactly the engine's
    * `TextFunctions.tokens` contract (trim, split on \\s+, no empty
    * filtering) so the seam and the column battery agree. Production
    * swaps trained weights behind the same per-partition lifecycle —
    * a weight table load is precisely what the one-instance-per-
    * partition contract amortizes. */
  final class HashedLinearScorer(buckets: Int = 1024) extends TextScorer {
    def scoreBatch(texts: Seq[String]): Seq[(Double, String)] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      texts.map { t =>
        val toks = t.trim.split("\\s+")
        var raw = 0L
        toks.foreach { tk =>
          md.reset()
          val hex = md.digest(tk.getBytes("UTF-8")).map("%02x".format(_))
            .mkString
          val h = java.lang.Long.parseLong(hex.take(8), 16)
          raw += ((h % buckets) * 2654435761L) % 2003L - 1001L
        }
        val score = raw / (1001.0 * toks.length)
        (score, if (score >= 0) "keep" else "drop")
      }
    }
  }

  /** Partition-wise batched scoring: one scorer instance per partition,
    * `batchSize` texts per `scoreBatch` call, streaming iteration (a
    * partition is never materialized — `grouped` buffers only one
    * batch). Output order inside each partition follows input order,
    * pinned by zipping scores back to ids positionally. */
  def scoreDocuments(df: DataFrame, id: Column, text: Column,
      newScorer: () => TextScorer = () => new StubScorer(),
      batchSize: Int = 64): Dataset[ScoredDoc] = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    // spread scoring across cores: a gate-scale table is one parquet
    // file = one scan partition, which would run the scorer serially
    // (measured: an 11 s single-task stage inside corpus_quality_e2e).
    // Round-robin repartition costs one narrow shuffle of (id, text)
    // and buys full parallelism; at 100 TB the scan is already wide
    // and this becomes a near-no-op rebalance.
    df.select(id.cast("long"), text).as[(Long, String)]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val scorer = newScorer() // per-partition model load
        it.grouped(batchSize).flatMap { batch =>
          val out = scorer.scoreBatch(batch.map(_._2))
          require(out.length == batch.length,
            s"TextScorer returned ${out.length} scores for " +
              s"${batch.length} inputs")
          batch.iterator.zip(out.iterator).map {
            case ((docId, _), (s, l)) => ScoredDoc(docId, s, l)
          }
        }
      }
  }
}
