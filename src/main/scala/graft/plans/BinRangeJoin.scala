package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Automatic binned range-join rewrite — the whole-operator rung of
  * the extension ladder (custom `Rule[LogicalPlan]` registered via
  * `SparkSessionExtensions`, above the codegen'd expression families
  * in `graft.functions`).
  *
  * A plain inner join on `pt >= lo AND pt < hi` plans as a broadcast
  * nested loop (or a cartesian product) — at 100 TB that is the
  * single worst plan Spark can emit: every point row visits every
  * interval. [[graft.ext.TemporalJoins.binnedRangeJoin]] solves it at
  * the API level; this rule applies the SAME rewrite to any
  * qualifying logical join automatically, so `spark.sql("... WHERE
  * p.t >= r.lo AND p.t < r.hi")` and third-party DataFrame code get
  * the scalable plan without calling the helper:
  *
  *   points  -> project  + floor-bin(pt)
  *   ranges  -> generate + explode(sequence(bin(lo), bin(hi-1)))
  *   join ON bins equal AND the ORIGINAL predicate (residual filter)
  *
  * which Catalyst then plans as a shuffled hash / sort-merge join on
  * the bin key. The rewrite is semantics-preserving for any data:
  * every (point, interval) pair satisfying the predicate shares the
  * point's bin (intervals explode to every bin they cover, half-open
  * end), and the residual filter removes bin-only collisions.
  *
  * Opt-in and conservative: fires only when
  * `spark.graft.binRangeJoin.width` is set to a positive long, only
  * on INNER joins whose condition is EXACTLY the two-conjunct range
  * shape over LongType expressions with the point side's references
  * entirely in the left child and the bounds' references entirely in
  * the right child. The rewritten join's condition no longer matches
  * the pattern, so the rule cannot re-fire on its own output. Bin
  * width is workload knowledge (interval span distribution), which is
  * why it is a conf and not inferred. The salted variant for
  * output-skewed workloads remains `binnedRangeJoin` (salting is the
  * mechanism AQE cannot replace for quadratic-output self-joins —
  * see `ext.Skew`).
  */
object BinRangeJoin {
  val WidthKey = "spark.graft.binRangeJoin.width"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => Rewrite)

  object Rewrite extends Rule[LogicalPlan] {

    /** Sign-correct floor division: (e - pmod(e, w)) div w — the
      * numerator is an exact multiple, where truncation == floor. */
    private def binOf(e: Expression, w: Long): Expression = {
      val wl = Literal(w)
      IntegralDivide(Subtract(e, Pmod(e, wl)), wl)
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val w = conf.getConfString(WidthKey, "0").toLong
      if (w <= 0) return plan
      plan.transformUp {
        case j @ Join(left, right, Inner,
            Some(And(GreaterThanOrEqual(pt1, lo), LessThan(pt2, hi))), _)
            if pt1.semanticEquals(pt2) &&
              pt1.dataType == LongType && lo.dataType == LongType &&
              hi.dataType == LongType &&
              pt1.references.subsetOf(left.outputSet) &&
              lo.references.subsetOf(right.outputSet) &&
              hi.references.subsetOf(right.outputSet) &&
              pt1.deterministic && lo.deterministic && hi.deterministic =>
          rewrite(j, left, right, pt1, lo, hi, w)
      }
    }

    private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
        pt: Expression, lo: Expression, hi: Expression,
        w: Long): LogicalPlan = {
      val lBin = Alias(binOf(pt, w), "__g_bin_l")()
      val pl = Project(left.output :+ lBin, left)
      // half-open end: last covered bin holds hi-1; empty interval ->
      // empty sequence -> Explode drops the row (it can hold no point)
      // Sequence is TimeZoneAware: in the optimizer no analyzer runs
      // to fill timeZoneId, so set it or the plan goes unresolved
      val seqExpr = If(GreaterThan(hi, lo),
        Sequence(binOf(lo, w), binOf(Subtract(hi, Literal(1L)), w),
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Seq.empty[Long], ArrayType(LongType, false)))
      val rBin = AttributeReference("__g_bin_r", LongType, nullable = true)()
      val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(rBin), child = right)
      val cond = And(EqualTo(lBin.toAttribute, rBin),
        And(GreaterThanOrEqual(pt, lo), LessThan(pt, hi)))
      Project(j.output, Join(pl, gen, Inner, Some(cond), j.hint))
    }
  }
}
