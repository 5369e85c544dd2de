package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Custom Catalyst AGGREGATE function — the remaining extension rung
  * next to the codegen'd scalar expression families, the typed
  * `Aggregator` (weighted_avg), the optimizer rules, the DSv2
  * connectors, and the native as-of-join SparkPlan.
  *
  * `graft_hll_est(hash32)` is a [[TypedImperativeAggregate]] over a
  * fixed 64-byte register buffer implementing EXACTLY the engine's
  * open-book HLL algebra (`AnalyticsQueries.hllRegisters`): bucket =
  * h mod 64, rank = 27 − bitlength(h ≫ 6) (0 → 27), registers merge
  * by cell-wise max, estimate = α·m²/Σ2^−reg with empty registers
  * contributing 2⁰. Because the state is a fixed 64-byte array and
  * `merge` is idempotent max, Spark's partial aggregation gives the
  * distributed story for free: map-side partials per partition, one
  * 64-byte row per group on the wire, re-merge anywhere — the
  * sketch-rollup shape at any scale. The Σ2^−reg fold runs in fixed
  * register order over exact dyadic doubles, so the DOUBLE estimate
  * is bit-stable against the relational twin and the DuckDB oracle
  * (same argument as `hll_distinct_estimates`; SKILL.md).
  *
  * The input is the PORTABLE 32-bit hash ([[TextFunctions.hash32]]),
  * not the raw key — hashing stays in the shared cross-engine
  * algebra, the aggregate only folds. */
case class HllEstAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_hll_est"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  // type check via the analysis hook, not a constructor require —
  // the builder can see unresolved children during analysis
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_est expects a LongType hash input, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](64)

  override def update(buf: Array[Byte], input: InternalRow)
      : Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & 63L).toInt // h is non-negative 32-bit
      val rest = h >>> 6
      val rank =
        if (rest == 0L) 27
        else 27 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < 64) {
      if (b2(j) > b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    // fixed register order + exact dyadic terms -> rounding-free sum
    var zsum = 0.0
    var j = 0
    while (j < 64) {
      zsum += 1.0 / (1L << buf(j)).toDouble
      j += 1
    }
    0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0 / zsum
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllEstAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllEstAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : HllEstAgg = copy(child = newChild)
}

object HllAgg {
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_est"),
      new ExpressionInfo(classOf[HllEstAgg].getName, "graft_hll_est"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_hll_est takes 1 arg, got ${children.size}")
        HllEstAgg(children.head)
      }))
}
