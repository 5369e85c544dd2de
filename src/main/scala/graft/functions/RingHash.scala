package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native consistent-hash ring lookup.
  *
  * [[graft.ext.Corpus.ringAssign]]'s semantics — first ring position
  * ≥ h clockwise, wrapping to the head — expressed with built-ins is
  * `size(filter(positions, p -> p < h))`: a per-row INTERPRETED
  * lambda over the whole ring (HOFs with lambdas never enter
  * whole-stage codegen, the round-10 Jaccard lesson), and a linear
  * scan besides. [[RingAssign]] is the codegen'd scalar: one call per
  * row, a JIT-compiled BINARY SEARCH over the broadcast ring literals
  * ([[RingHash.ringPick]]) — O(log ring) inside the generated loop,
  * keeping shard assignment of a 100 TB keyspace a pure map-side
  * expression even with thousands of virtual nodes.
  *
  * Contract: `positions` must be sorted ascending (ties pre-broken by
  * shard order in the array construction — [[graft.ext.Corpus.consistentRing]]
  * sorts by (position, shard)); `positions` and `shards` are parallel
  * arrays. Both arrive as plan literals, so the arrays are constants
  * in generated code.
  *
  * Registered as SQL function `ring_assign` via
  * [[org.apache.spark.sql.SparkSessionExtensions]] (see
  * [[RingHash.register]], wired in `Sessions.builder`).
  */
object RingHash {

  /** First index i with positions(i) >= h (binary search over the
    * sorted positions), wrapping to 0 past the end; returns
    * shards(i). Called from generated code — keep the signature
    * JVM-simple. */
  def ringPick(h: Long, positions: ArrayData, shards: ArrayData): Long = {
    val n = positions.numElements()
    // ring_assign is a registered SQL function, so user SQL can reach
    // it with arrays outside the consistentRing contract — fail loudly
    // instead of reading past an empty/mismatched ArrayData
    if (n == 0)
      throw new IllegalArgumentException(
        "ring_assign: positions array is empty (the ring has no nodes)")
    if (shards.numElements() != n)
      throw new IllegalArgumentException(
        s"ring_assign: positions ($n) and shards " +
          s"(${shards.numElements()}) must be parallel arrays")
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (positions.getLong(mid) < h) lo = mid + 1 else hi = mid
    }
    shards.getLong(if (lo == n) 0 else lo)
  }

  /** Column form of [[RingAssign]] (requires [[register]]ed session). */
  def ringAssign(h: Column, positions: Column, shards: Column): Column =
    call_function("ring_assign", h, positions, shards)

  /** SparkSessionExtensions hook:
    * `ring_assign(bigint, array<bigint>, array<bigint>) -> bigint`. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("ring_assign"),
      new ExpressionInfo(classOf[RingAssign].getName, "ring_assign"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"ring_assign takes 3 args, got ${children.size}")
        RingAssign(children.head, children(1), children(2))
      }))
}

/** Codegen'd consistent-hash ring lookup — see [[RingHash]] for the
  * contract. */
case class RingAssign(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && isLongArray(second) &&
        isLongArray(third)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ring_assign requires (bigint, array<bigint>, array<bigint>), " +
        s"got ${first.dataType.sql}, ${second.dataType.sql}, " +
        s"${third.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "ring_assign"

  override protected def nullSafeEval(h: Any, pos: Any, sh: Any): Any =
    RingHash.ringPick(h.asInstanceOf[Long],
      pos.asInstanceOf[ArrayData], sh.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, p, s) =>
      s"graft.functions.RingHash.ringPick($h, $p, $s)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RingAssign =
    copy(first = newFirst, second = newSecond, third = newThird)
}
