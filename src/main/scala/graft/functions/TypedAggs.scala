package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY §2.10). The engine's rule is
  * "functions, not UDFs" — every hot path compiles to built-in Column
  * expressions or native codegen'd expressions ([[VecKernels]]) — but
  * the UDAF extension point itself is part of the engine surface a
  * user extends, so it is exercised by a real, oracle-gated
  * aggregator here.
  *
  * [[WeightedMean]]: exact-decimal weighted mean Σ(w·x)/Σw. Partial
  * sums are JVM BigDecimals (arbitrary precision — exact at any
  * partitioning; the buffer encodes as decimal(38,18)), and the
  * double division happens once at the end from correctly-rounded
  * operands, so the result is bit-identical to a single-node engine
  * evaluating CAST(SUM(w*x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE).
  * Merge is associative+commutative => safe under AQE re-partitioning.
  */
object TypedAggs {

  /** (Σ w·x, Σ w) running in exact decimals. */
  final case class WSum(sx: JBigDecimal, sw: JBigDecimal)

  /** Input: (x, w) already cast to exact decimals by the caller. */
  object WeightedMean
      extends Aggregator[(JBigDecimal, JBigDecimal), WSum, Double] {
    private val Z = JBigDecimal.ZERO
    override def zero: WSum = WSum(Z, Z)
    override def reduce(b: WSum, in: (JBigDecimal, JBigDecimal)): WSum =
      in match {
        case (null, _) | (_, null) => b // SQL semantics: null rows skipped
        case (x, w) => WSum(b.sx.add(x.multiply(w)), b.sw.add(w))
      }
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.sx.add(b.sx), a.sw.add(b.sw))
    override def finish(r: WSum): Double =
      if (r.sw.signum() == 0) Double.NaN
      else r.sx.doubleValue() / r.sw.doubleValue()
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded-state top-k buffer: the k best (score, id) pairs seen,
    * ordered score desc then id asc. */
  final case class TopKBuf(items: Seq[(Double, Long)])

  /** Exact top-k ids per group with O(k) state — the scale-preferred
    * alternative to `row_number() OVER (PARTITION BY g ORDER BY s)`,
    * which sorts EVERY group member through the shuffle. This
    * aggregator's partial buffers never exceed k entries, so the
    * map side combines each partition down to k rows per group
    * before anything moves, and a 10⁹-member hot group costs the
    * shuffle exactly what a 10-member group does.
    *
    * Total order (score desc, id asc) makes the result deterministic
    * under ties; merge is associative+commutative (AQE-safe).
    * Returns ids only — cross-engine gates compare id lists, never
    * formatted doubles. */
  final case class TopKIds(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, Seq[Long]] {
    require(k >= 1, "k >= 1")
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy(t => (-t._1, t._2)).take(k)
    override def zero: TopKBuf = TopKBuf(Seq.empty)
    override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf =
      // fast path: a full buffer whose worst entry beats the newcomer
      // skips the resort (the common case once the group warms up)
      if (b.items.size == k) {
        val worst = b.items.last
        if (in._1 < worst._1 || (in._1 == worst._1 && in._2 > worst._2)) b
        else TopKBuf(trim(in +: b.items))
      } else TopKBuf(trim(in +: b.items))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(trim(a.items ++ b.items))
    override def finish(r: TopKBuf): Seq[Long] = r.items.map(_._2)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
