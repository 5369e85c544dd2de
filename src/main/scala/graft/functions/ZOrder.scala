package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.functions.{call_function, col}

/** Z-order (Morton) curve clustering for multi-dimensional data
  * layout.
  *
  * At 100 TB, scan cost is decided by how many files a filter can
  * SKIP via parquet min/max footer stats — and a single-column sort
  * only narrows that one column's ranges: a predicate on any other
  * column still touches every file. Interleaving the bits of two key
  * columns (the Z-order curve) bounds BOTH columns' value ranges
  * within every contiguous run of the sort order, so range-partitioned
  * + sorted-by-z files carry tight min/max stats on both dimensions
  * and two-column predicates prune multiplicatively. This is the
  * standard lakehouse layout technique (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`), provided here as a native engine primitive.
  *
  * `z_order2(x, y)`: interleaves the low 32 bits of two non-negative
  * longs (x in even bit positions, y in odd) via the constant-time
  * magic-number spread — five shift/mask rounds per operand, fully
  * inside whole-stage codegen, no lookup tables. Null if either input
  * is null; inputs are masked to their low 32 bits (callers bucket
  * wider domains first, which is also what bounds the curve's cell
  * geometry).
  *
  * [[ZOrder.cluster]] is the layout operator: range-repartition by
  * z-value (cluster boundaries via Spark's range sampling — one extra
  * sampling pass, standard for any sorted write) + in-partition sort,
  * which is exactly the shape `DataFrameWriter` turns into one file
  * per partition with monotone z-runs.
  */
object ZOrder {

  /** Spread the low 32 bits of v to the even bit positions of a
    * 64-bit word. Called from generated code — JVM-simple. */
  def spread2(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton interleave: x on even bits, y on odd bits. */
  def z2(x: Long, y: Long): Long = spread2(x) | (spread2(y) << 1)

  /** Column form of [[ZOrder2]] (requires [[register]]ed session). */
  def zOrder2(x: Column, y: Column): Column = call_function("z_order2", x, y)

  /** Layout operator: cluster `df` so every output partition (= one
    * written file) covers a contiguous z-range of (x, y). */
  def cluster(df: DataFrame, x: Column, y: Column, numPartitions: Int): DataFrame = {
    val z = zOrder2(x.cast("long"), y.cast("long")).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** SparkSessionExtensions hook:
    * `z_order2(bigint, bigint) -> bigint`. */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("z_order2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "z_order2"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"z_order2 takes 2 args, got ${children.size}")
        // widen int/smallint/tinyint args; non-integral types are
        // rejected by checkInputDataTypes with the type names intact
        def widen(e: Expression): Expression = e.dataType match {
          case ByteType | ShortType | IntegerType => Cast(e, LongType)
          case _ => e
        }
        ZOrder2(widen(children.head), widen(children(1)))
      }))
  }
}

/** Codegen'd Morton interleave of two longs — see [[ZOrder]]. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "z_order2 requires bigint arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "z_order2"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.z2(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrder.z2($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}
