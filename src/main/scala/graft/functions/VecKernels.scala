package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native exact-decimal vector kernel.
  *
  * The similarity operators need `sum_i round(a[i]*b[i], 12dp)` in
  * exact DECIMAL — exact so that no engine's accumulation order can
  * change the result vs the DuckDB oracle (decimal addition is
  * associative; doubles are not). The two built-in ways to compute it
  * both pay a structural tax:
  *  - `zip_with` + `aggregate` evaluate their lambda INTERPRETED per
  *    element per pair (measured 30x on the ANN queries);
  *  - posexplode -> equi-join on the index -> hash-agg is codegen'd
  *    but multiplies every vector into `dim` shuffle rows and runs a
  *    full aggregation just to fold one pair.
  *
  * [[DecimalVecDot]] is the missing scalar: ONE whole-stage-codegen'd
  * call per pair, a tight JIT-compiled loop inside ([[VecKernels.dotDec]]),
  * no row expansion, no aggregation. Per-product rounding matches
  * Spark's `CAST(double AS DECIMAL(28,12))` (BigDecimal.valueOf ==
  * BigDecimal(Double.toString), then HALF_UP to scale 12), so swapping
  * the execution shape does not move a single output bit. Float
  * elements are read in place and widened exactly — no casted array
  * copy per row.
  *
  * Registered as SQL function `vec_dot_dec` via
  * [[org.apache.spark.sql.SparkSessionExtensions]] (see
  * [[VecKernels.register]], wired in `Sessions.builder`).
  */
object VecKernels {

  /** Exact decimal(28,12) dot product: zip to the shorter length (the
    * equi-join-on-index semantics), skip null element pairs (SUM
    * semantics), round each product exactly like the
    * double->decimal(28,12) cast, accumulate exactly. `aFloat`/
    * `bFloat` select the element reader (flags are compile-time
    * literals in generated code, so the JIT sees a monomorphic loop).
    * Called from generated code — keep the signature JVM-simple. */
  def dotDec(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc = acc.add(java.math.BigDecimal.valueOf(x * y)
          .setScale(12, java.math.RoundingMode.HALF_UP))
      }
      i += 1
    }
    val d = Decimal(scala.math.BigDecimal(acc))
    // 16 integral digits of headroom; embeddings are O(1)-magnitude.
    // Throw rather than return null: defineCodeGen has already decided
    // non-null, and a silent null would corrupt downstream cosines.
    if (!d.changePrecision(28, 12))
      throw new ArithmeticException(
        "vec_dot_dec overflow: |result| too large for DECIMAL(28,12)")
    d
  }

  /** Column form of [[DecimalVecDot]] (requires [[register]]ed session). */
  def vecDotDec(a: Column, b: Column): Column = call_function("vec_dot_dec", a, b)

  /** Exact squared L2 norm. */
  def vecNorm2Dec(a: Column): Column = vecDotDec(a, a)

  /** SparkSessionExtensions hook: `vec_dot_dec(array<float|double>,
    * array<float|double>) -> decimal(28,12)`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("vec_dot_dec"),
      new ExpressionInfo(classOf[DecimalVecDot].getName, "vec_dot_dec"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"vec_dot_dec takes 2 args, got ${children.size}")
        DecimalVecDot(children.head, children(1))
      }))
}

/** `sum_i round(a[i]*b[i], 12dp)` as one codegen'd scalar — see
  * [[VecKernels]] for why this exists and its exact-arithmetic
  * contract. */
case class DecimalVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemKind(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemKind(left).isDefined && elemKind(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot_dec requires array<float|double> arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DecimalType(28, 12)

  override def prettyName: String = "vec_dot_dec"

  private lazy val aFloat = elemKind(left).get
  private lazy val bFloat = elemKind(right).get

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotDec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.dotDec($a, $b, $aFloat, $bFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalVecDot =
    copy(left = newLeft, right = newRight)
}
