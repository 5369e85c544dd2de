package graft.plans

import scala.annotation.tailrec
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** Materialized-view ROLLUP REWRITE — answer an aggregate over the
  * base table from a registered summary table when the summary
  * subsumes it (the classic MV-matching optimization: Oracle query
  * rewrite, BigQuery MV smart-tuning, Materialize). At 100 TB this
  * is the difference between re-scanning a fact table and re-rolling
  * a few thousand summary rows — the relational completion of the
  * CMS/HLL "mergeable state" story.
  *
  * A summary registered by [[MvCatalog.registerSummary]] stores, per
  * group of `keys`: `cnt_rows` and, for each covered column c,
  * `sum_c` / `min_c` / `max_c` / `cntn_c`. The rule rewrites
  *
  *   Aggregate(G ⊆ keys, [sum(c) | min(c) | max(c) | count(c) |
  *     count(1) | key refs], scan(base))
  *
  * to the same aggregate over the summary with each function replaced
  * by its re-aggregation (sum→sum of partial sums, count→sum of
  * partial counts, min/max→min/max of partial extrema) — sound
  * because all four are associative–commutative over the partials.
  * `sum` is matched only on EXACT types (integral/decimal): a double
  * sum regrouped through partials is not bit-identical to the direct
  * sum, and a rewrite that changes the answer is not an optimization.
  *
  * Output attribute ids and types are preserved (aliases carry the
  * original exprIds; a Cast restores widened decimal sums), so the
  * rewrite is invisible to parent operators. The stored MV plan is
  * the MATERIALIZED (InMemoryRelation) optimized plan, which both
  * truncates the MV's own definition (the rule cannot re-fire on it)
  * and makes the rewritten query scan memory, not parquet.
  *
  * Opt-in via `spark.graft.mvRewrite.enabled`; conservative: fires
  * only on Filter-free aggregates whose child strips (through pure
  * attribute Projects) to the registered base path's LogicalRelation,
  * with bare-attribute grouping keys and aggregate children. */
object MvRewrite {
  val EnabledKey = "spark.graft.mvRewrite.enabled"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => Rewrite)

  object Rewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (conf.getConfString(EnabledKey, "false") != "true") return plan
      val mvs = MvCatalog.all
      if (mvs.isEmpty) return plan
      plan.transformUp {
        case agg @ Aggregate(groupExprs, _, _, _)
            if agg.resolved && groupExprs.forall(
              _.isInstanceOf[AttributeReference]) =>
          mvs.iterator.flatMap(mv => tryRewrite(agg, mv))
            .nextOption().getOrElse(agg)
      }
    }

    /** Strip pure column Projects AND the Tables.normalize shape —
      * same-name Cast aliases (`cast(ts as timestamp) AS ts`). The
      * same-name restriction matters: an alias binding a covered name
      * to different content would silently change what the MV's
      * columns mean. */
    @tailrec private def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, c) if pl.forall {
          case _: AttributeReference => true
          case Alias(Cast(a: AttributeReference, _, _, _), n) =>
            a.name == n
          case _ => false
        } => strip(c)
      case other => other
    }

    private def isBase(p: LogicalPlan, suffix: String): Boolean = p match {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        h.location.rootPaths.exists(_.toString.endsWith(suffix))
      case _ => false
    }

    private def tryRewrite(agg: Aggregate, mv: MvCatalog.Mv)
        : Option[LogicalPlan] = {
      // a Filter over KEY columns only commutes with the group-by and
      // survives the rewrite (rollup of a key slice); any other
      // predicate blocks the match
      val (keyFilter, scanSide) = strip(agg.child) match {
        case f @ logical.Filter(cond, inner)
            if cond.deterministic &&
              cond.references.forall(a => mv.keys.contains(a.name)) =>
          (Some(f), strip(inner))
        case other => (None, other)
      }
      if (!isBase(scanSide, mv.baseSuffix)) return None
      val groupNames = agg.groupingExpressions
        .map(_.asInstanceOf[AttributeReference].name)
      if (!groupNames.forall(mv.keys.contains)) return None
      val mvAttr: String => Option[Attribute] =
        n => mv.plan.output.find(_.name == n)

      def exact(dt: org.apache.spark.sql.types.DataType): Boolean =
        dt match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType => true
          case _: org.apache.spark.sql.types.DecimalType => true
          case _ => false
        }

      val rewritten = agg.aggregateExpressions.map {
        case a: AttributeReference if mv.keys.contains(a.name) =>
          mvAttr(a.name).map(k => Alias(k, a.name)(exprId = a.exprId))
        case al @ Alias(ae: AggregateExpression, name)
            if ae.mode == Complete && !ae.isDistinct &&
              ae.filter.isEmpty =>
          // second tuple slot marks a COUNT→SUM rewrite: for a GLOBAL
          // aggregate over an empty base COUNT returns 0 but SUM over
          // the empty summary returns NULL, so that case must be
          // coalesced back to 0 (with grouping keys the empty group is
          // absent on both sides and no fix-up is needed).
          val nf: Option[(AggregateFunction, Boolean)] =
            ae.aggregateFunction match {
              case Sum(x: AttributeReference, _)
                  if mv.covered.contains(x.name) && exact(x.dataType) =>
                mvAttr(s"sum_${x.name}").map(a => (Sum(a), false))
              case Min(x: AttributeReference)
                  if mv.covered.contains(x.name) =>
                mvAttr(s"min_${x.name}").map(a => (Min(a), false))
              case Max(x: AttributeReference)
                  if mv.covered.contains(x.name) =>
                mvAttr(s"max_${x.name}").map(a => (Max(a), false))
              case Count(Seq(Literal(_, _))) =>
                mvAttr("cnt_rows").map(a => (Sum(a), true))
              case Count(Seq(x: AttributeReference))
                  if mv.covered.contains(x.name) =>
                mvAttr(s"cntn_${x.name}").map(a => (Sum(a), true))
              case _ => None
            }
          nf.map { case (f, isCount) =>
            val nae = ae.copy(aggregateFunction = f)
            val zeroed: Expression =
              if (isCount && agg.groupingExpressions.isEmpty)
                Coalesce(Seq(nae, Literal(0L)))
              else nae
            val e: Expression =
              if (zeroed.dataType == al.dataType) zeroed
              else Cast(zeroed, al.dataType, Some(conf.sessionLocalTimeZone))
            Alias(e, name)(exprId = al.exprId)
          }
        case _ => None
      }
      if (rewritten.exists(_.isEmpty)) return None
      val newKeys = groupNames.map(n => mvAttr(n).get)
      val newChild = keyFilter match {
        case Some(f) =>
          val remapped = f.condition.transform {
            case a: AttributeReference => mvAttr(a.name).get
          }
          logical.Filter(remapped, mv.plan)
        case None => mv.plan
      }
      Some(Aggregate(newKeys, rewritten.map(_.get), newChild))
    }
  }
}

/** Registry of materialized summaries the rewrite rule may use.
  * Registration BUILDS and MATERIALIZES the summary (cache + eager
  * count — [[graft.Tables.materialize]]); the stored plan is the
  * optimized InMemoryRelation leaf. */
object MvCatalog {
  case class Mv(baseSuffix: String, keys: Seq[String],
      covered: Seq[String], plan: LogicalPlan)

  private val mvs = mutable.Map[String, Mv]()

  def all: Seq[Mv] = mvs.synchronized(mvs.values.toSeq)
  def clear(): Unit = mvs.synchronized(mvs.clear())

  /** Idempotent per name: build `base.groupBy(keys).agg(cnt_rows,
    * sum_c/min_c/max_c/cntn_c for each covered c)`, materialize it,
    * and make it available to the rule for aggregates over
    * `baseSuffix`'s relation. */
  def registerSummary(name: String, base: DataFrame, baseSuffix: String,
      keys: Seq[String], covered: Seq[String]): Unit =
    mvs.synchronized {
      if (!mvs.contains(name)) {
        val aggs = Seq(count(lit(1)).as("cnt_rows")) ++
          covered.flatMap(c => Seq(
            sum(col(c)).as(s"sum_$c"), min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c"), count(col(c)).as(s"cntn_$c")))
        val mv = graft.Tables.materialize(
          base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*))
        mvs(name) = Mv(baseSuffix, keys, covered,
          mv.queryExecution.optimizedPlan)
      }
    }
}
