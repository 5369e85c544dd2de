package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.queries.TpchQueries

/** Plan-shape assertions for the TPC-H-shaped gates: the properties
  * that matter at 100 TB (broadcasts where intended, filters reaching
  * the scans) — correctness itself is the DuckDB oracle's job.
  */
class TpchPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q18: the HAVING side broadcasts — orders/customer never shuffle") {
    val plan = formatted(TpchQueries.q18LargeOrders(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q10: date bounds and returnflag are pushed to the scans") {
    val plan = formatted(TpchQueries.q10ReturnedItems(spark, dir))
    assert(plan.contains("PushedFilters"))
    // returnflag filter reaches the lineitem parquet scan
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan.take(2000))
    // date range reaches the orders scan
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("q7: the only shuffle join is lineitem><orders; dims broadcast " +
    "BELOW it (semi-filters run before the orderkey shuffle)") {
    // the tree printout lists every node ONCE (formatted mode would
    // double-count: tree section + per-node details)
    val tree = TpchQueries.q7VolumeShipping(spark, dir)
      .queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(tree).length
    assert(nBroadcast >= 2, s"expected >=2 broadcast joins:\n$tree")
    val nShuffle = "SortMergeJoin".r.findAllIn(tree).length +
      "ShuffledHashJoin".r.findAllIn(tree).length
    assert(nShuffle <= 1, s"expected at most one shuffle join:\n$tree")
    // parents print before children: any shuffle join must be an
    // ANCESTOR of the broadcast joins, i.e. the pair semi-filters
    // apply before fact rows shuffle on orderkey (Spark won't reorder
    // inner joins without CBO — the join tree has to encode it)
    val iSmj = tree.indexOf("SortMergeJoin") max tree.indexOf("ShuffledHashJoin")
    val iBhj = tree.indexOf("BroadcastHashJoin")
    assert(iBhj >= 0 && (iSmj < 0 || iSmj < iBhj),
      s"shuffle join must sit above the broadcast joins:\n$tree")
  }

  test("q15: tie compare stays in decimal and the max row broadcasts") {
    val df = TpchQueries.q15TopSupplier(spark, dir)
    val plan = formatted(df)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"))
    // non-empty at the smallest SF too (driver smoke scale)
    assert(df.count() >= 1)
  }

  test("not_in_null_trap's fingerprint is non-vacuous at smoke scale: " +
    "NULL keys exist, NOT IN zeroes, NOT EXISTS doesn't") {
    val r = graft.queries.RelationalQueries.notInNullTrap(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_null_keys") > 0L)
    assert(r.getAs[Long]("n_not_in") == 0L)
    assert(r.getAs[Long]("n_not_exists") > 0L)
  }

  test("q6: all three predicates reach the parquet scan; no shuffle " +
    "except the final 1-row aggregate") {
    val plan = formatted(TpchQueries.q6RevenueDelta(spark, dir))
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(3000))
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.02)"))
    assert(plan.contains("LessThan(l_quantity,24.0)"))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin")) // scan -> agg, nothing else
  }

  test("q19: the common brand disjunct is pushed into the part side") {
    val plan = formatted(TpchQueries.q19DisjunctiveRev(spark, dir))
    // brand IN (...) reaches the part scan as a pushed filter; the
    // full OR runs as a residual on the joined row
    assert(plan.contains("In(p_brand"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q21: ONE orderkey shuffle feeds both the per-order aggregate " +
    "and the flagged join (no second fact scan pattern)") {
    val tree = TpchQueries.q21WaitingSupplier(spark, dir)
      .queryExecution.executedPlan.toString
    // supplier side broadcasts; the heavy joins are on orderkey
    assert(tree.contains("BroadcastHashJoin"), tree)
    val q = TpchQueries.q21WaitingSupplier(spark, dir)
    assert(q.count() >= 1)
  }

  test("q2: tie rows share the exact-decimal min cost") {
    val rows = TpchQueries.q2MinCostSupplier(spark, dir).collect()
    // every returned (part, supplier) carries its part's min cost:
    // grouping by part, all costs within a part are equal
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    byPart.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("cost")).distinct.length == 1)
    }
  }

  test("q8/q14 shares are in [0,1] / [0,100] at smoke scale") {
    val q8 = TpchQueries.q8MarketShare(spark, dir).collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
    val q14 = TpchQueries.q14PromoShare(spark, dir).collect()
    assert(q14.length == 1)
    val p = q14.head.getAs[Double]("promo_share")
    assert(p >= 0.0 && p <= 100.0)
  }
}
