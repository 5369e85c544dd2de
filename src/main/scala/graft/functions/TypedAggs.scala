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
}
