package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession,
  SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode,
  LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native backward as-of join — the WHOLE-OPERATOR extension rung
  * (custom `LogicalPlan` node + `SparkStrategy` + `SparkPlan`),
  * completing the ladder next to the engine's custom codegen'd
  * expressions and its two optimizer rules.
  *
  * Why a physical operator when [[graft.ext.TemporalJoins
  * .asofJoinBackward]] already composes the same semantics from
  * union + window: the composed plan pays for generality — it
  * shuffles BOTH tables into one union (every row widened with a
  * null struct of the other side's shape), sorts the union, and runs
  * a running-`last` window before re-projecting. The native operator
  * declares exactly what the merge needs — children clustered on
  * their keys ([[ClusteredDistribution]]) and sorted by (key, time)
  * — and `EnsureRequirements` plans the minimal exchanges; the merge
  * itself is then a single forward pass over co-partitioned sorted
  * iterators holding ONE buffered right row (no union frame, no
  * null-struct widening, no window state). Semantics are identical:
  * for each left row, the right row with the greatest
  * `rightTime <= leftTime` on the same key, left-outer, ties-at-t
  * matching.
  *
  * Scale: the operator inherits Spark's machinery for everything
  * outside the merge — AQE re-plans its exchanges like any
  * sort-merge join's, skewed keys are bounded by their own group, и
  * the pass holds O(1) state per partition. Restrictions (asserted,
  * not silent): key and time columns must be long-backed (LongType /
  * TimestampType), null keys/times never match, and right rows
  * should be unique per (key, time) — among same-instant rows the
  * last in sort order wins, as in the composed operator. */
object AsOfJoinNative {

  /** Logical node: resolved from construction (children come in
    * analyzed, attributes are their outputs'), so analysis passes it
    * through and optimizer rules that don't know it leave it — and
    * its children's subtrees — individually optimized. */
  case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one-to-one mapping of the logical node onto
    * the physical merge. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => Strategy)

  /** Public face: backward as-of join of two DataFrames on
    * long-backed key and time columns. Column names are resolved
    * against each side's analyzed output; the result carries all
    * left columns then all right columns (nullable). `left` and
    * `right` must not share attribute lineage (join a table with
    * itself through a fresh alias/copy first), the usual self-join
    * caveat for manually built plans. */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }

  /** Forward as-of (smallest `rightTime >= leftTime`) through the
    * SAME physical operator: backward-on-negated-times is exactly
    * forward — `max{-rt : -rt <= -lt}` = `min{rt : rt >= lt}`, ties
    * included on both sides of the equivalence. The wrapper adds one
    * negated-micros column per side, joins, and drops the helpers;
    * no second operator to maintain or verify. */
  def asofForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    def negMicros(df: DataFrame, c: String) =
      if (df.schema(c).dataType == TimestampType)
        -unix_micros(col(c))
      else -col(c)
    val ln = "__graft_neg_lt"
    val rn = "__graft_neg_rt"
    asofBackward(
        left.withColumn(ln, negMicros(left, leftTime)),
        right.withColumn(rn, negMicros(right, rightTime)),
        leftKey, rightKey, ln, rn)
      .drop(ln, rn)
  }

  private def longBacked(a: Attribute): Boolean =
    a.dataType == LongType || a.dataType == TimestampType

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTime: Attribute, rightTime: Attribute)
      extends BinaryExecNode {

    require(Seq(leftKey, rightKey, leftTime, rightTime).forall(longBacked),
      "as-of join keys/times must be long-backed (LongType/TimestampType)")

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // co-partition children on their keys; EnsureRequirements plans
    // the minimal exchanges (none when a child is already clustered)
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    override def outputPartitioning: Partitioning =
      left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      requiredChildOrdering.head

    override lazy val metrics = Map(
      "numOutputRows" ->
        SQLMetrics.createMetric(sparkContext, "number of output rows"),
      "numMatched" ->
        SQLMetrics.createMetric(sparkContext, "number of matched rows"))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val numOutputRows = longMetric("numOutputRows")
      val numMatched = longMetric("numMatched")
      val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
      val ltIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
      val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
      val rtIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
      require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
        "as-of join columns must be direct child outputs")
      val outAttrs = output
      val lOut = left.output
      val rOut = right.output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // bind against the nullability-ADJUSTED right attributes: the
        // operator's output declares every right column nullable (the
        // null-padding row for unmatched left rows), so the projection
        // must emit null checks even when the right child's schema says
        // non-nullable — binding rOut as-is would read the padding row
        // without isNullAt and turn NULLs into 0/NPE.
        val proj = UnsafeProjection.create(
          outAttrs, lOut ++ rOut.map(_.withNullability(true)))
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOut.size)

        new Iterator[InternalRow] {
          private var rRow: InternalRow = advanceRight()
          private var matchRow: InternalRow = null
          private var matchKey: Long = 0L
          private var hasMatch = false

          private def advanceRight(): InternalRow = {
            while (rIter.hasNext) {
              val r = rIter.next()
              if (!r.isNullAt(rkIdx) && !r.isNullAt(rtIdx)) return r
            }
            null
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            numOutputRows += 1
            if (l.isNullAt(lkIdx) || l.isNullAt(ltIdx))
              return proj(joined(l, nullRight))
            val lk = l.getLong(lkIdx)
            val lt = l.getLong(ltIdx)
            while (rRow != null && {
              val rk = rRow.getLong(rkIdx)
              rk < lk || (rk == lk && rRow.getLong(rtIdx) <= lt)
            }) {
              // buffer exactly one right row: the latest one at or
              // before the current left position in (key, time) order
              matchRow = rRow.copy()
              matchKey = rRow.getLong(rkIdx)
              hasMatch = true
              rRow = advanceRight()
            }
            if (hasMatch && matchKey == lk) {
              numMatched += 1
              proj(joined(l, matchRow))
            } else proj(joined(l, nullRight))
          }
        }
      }
    }
  }
}
