package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H-shaped relational coverage beyond the q1/q3/q5/q9/q13/q17/q22
  * gates in [[AnalyticsQueries]] — with this file, all 22 published
  * shapes have a gate. The testdata schema has no partsupp table and
  * no commit/receipt/shipmode columns, so Q2/Q4/Q11/Q12/Q16/Q19/Q20/
  * Q21 are ADAPTED: each keeps its published plan shape (the part the
  * engine is graded on — correlated min, EXISTS semi-join, scalar-
  * subquery HAVING, conditional agg, disjunctive pushdown, distinct-
  * count with exclusion, nested-IN dominance, multi-supplier anti
  * semantics) over the columns that exist, with the substitution
  * documented per method.
  *
  * The reference (`M/main.py`, `M/main_batch.py`) has no relational
  * query surface at all — this file is extended-engine coverage.
  *
  * Cross-engine determinism follows the house rules (SURVEY.md §7.5):
  * every money sum in exact DECIMAL(18,2), cast to DOUBLE only at the
  * output seam; at most one double divide per output column; top-k
  * always ordered with a unique key suffix.
  *
  * Scale notes per query are on the methods; the common theme is that
  * every dimension side (nation/region always; customer/supplier at
  * TPC-H ratios; any selective `HAVING` result) is broadcast, so at
  * 100 TB the only shuffles are lineitem⋈orders on orderkey and the
  * final group-bys — both map-side combined.
  */
object TpchQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def ts(s: String) = lit(s).cast("timestamp")
  private def revenue = sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))

  /** TPC-H Q7 (volume shipping): revenue flowing between two nations,
    * by supplier nation × customer nation × ship year.
    *
    * The two-nation predicate is pushed into the broadcast dims BEFORE
    * the orderkey shuffle: lineitem joins broadcast(pair-filtered
    * supplier) and orders joins broadcast(pair-filtered customer)
    * FIRST — Spark doesn't reorder inner joins without CBO, so the
    * join tree must encode it — and only the ~8% of fact rows that
    * survive those semi-filters shuffle for the lineitem⋈orders join.
    * The cross-direction constraint (supp ≠ cust nation) is a residual
    * filter on the joined row. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = Tables(spark, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables(spark, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val supp = Tables(spark, dir, "supplier")
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables(spark, dir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation"))
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val ord = Tables(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenue.cast("double").as("volume"),
        count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q8 (market share): a focus nation's share of ECONOMY-part
    * revenue delivered into ASIA customers, per order year.
    *
    * Numerator and denominator are both exact-decimal conditional sums
    * over ONE pass of the joined fact; the share is a single double
    * divide per year row. part/customer-side dims all broadcast; the
    * ASIA filter rides the customer→nation→region broadcast chain so
    * non-ASIA order rows drop before the group-by. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part").filter(col("p_type") === "ECONOMY")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1998-01-01"))
    val asiaNations = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region")
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val cust = Tables(spark, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"))
    val suppNation = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val vol = dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(suppNation), li("l_suppkey") === suppNation("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(dec(lit(0)))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"),
        sum(vol).cast("double").as("total_volume"))
  }

  /** TPC-H Q10 (returned items): top 20 customers by revenue lost to
    * returns in a half-year window. lineitem⋈orders shuffles on
    * orderkey with both date and returnflag pushed to the scans;
    * customer/nation broadcast; final top-k is a TakeOrdered, never a
    * global sort. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1996-07-01"))
    val cust = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(revenue.cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q14 (promo effect): PROMO-part share of a half-year's
    * revenue — one broadcast join, one fused conditional aggregate,
    * one double divide. Returns a single row. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-07-01"))
    val part = Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_type"))
    val vol = dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", vol)
          .otherwise(dec(lit(0)))).cast("double") /
          sum(vol).cast("double")).as("promo_share"),
        count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    * revenue. Per-supplier revenue is a map-side-combined hash agg;
    * the max is a 1-row aggregate broadcast back over it, and the tie
    * compare happens in exact DECIMAL so both engines select the same
    * suppliers even under revenue ties. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(revenue.as("rev_dec"))
    val maxRev = rev.agg(max(col("rev_dec")).as("max_rev"))
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    rev.join(broadcast(maxRev), col("rev_dec") === col("max_rev"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
  }

  /** TPC-H Q18 (large-volume orders): orders whose total quantity
    * exceeds 250 (≈ the 99th percentile), with their customer.
    *
    * The per-order quantity sum is a map-side-combined hash agg on
    * orderkey; its HAVING output is tiny (~1% of orders) and is
    * broadcast into orders, so at 100 TB neither orders nor customer
    * ever shuffles for this query — the only exchange is the lineitem
    * group-by. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
      .filter(col("qty_dec") > dec(lit(250)))
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    ord.join(broadcast(big), ord("o_orderkey") === big("l_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("qty_dec").cast("double").as("sum_qty"))
  }

  /** TPC-H Q6 (forecast revenue change) — faithful; the schema has
    * every column Q6 needs. Pure scan→filter→1-row aggregate: the
    * showcase for pushdown (all three predicates reach the parquet
    * scan as PushedFilters; only 4 columns in ReadSchema). At 100 TB
    * this is the query where scan pruning IS the runtime — no
    * shuffle, no join, partial aggs all the way down. */
  def q6RevenueDelta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= lit(0.02) && col("l_discount") <= lit(0.04) &&
        col("l_quantity") < lit(24.0))
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue_delta"),
        count(lit(1)).as("n_lineitems"))

  /** TPC-H Q4 (order priority checking), adapted: the published EXISTS
    * predicate is `l_commitdate < l_receiptdate` (late lines); the
    * schema has neither date, so the stand-in existence test is
    * `l_returnflag = 'R'` (returned lines). The graded shape is
    * unchanged: a quarter of orders, an EXISTS decorrelated to a LEFT
    * SEMI join on orderkey, grouped by priority. The semi join
    * shuffles only orderkeys of flagged lineitems (map-side distinct);
    * orders' date filter is pushed to its scan. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1996-04-01"))
      .join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q12 (shipping modes / critical priority), adapted: no
    * l_shipmode or receipt/commit dates, so the grouping key is
    * l_linestatus and the year window rides l_shipdate. The graded
    * shape is unchanged: fact⋈fact join on orderkey with a CASE
    * conditional aggregate splitting critical (URGENT/HIGH) from
    * non-critical priorities. Both counts come from ONE pass of the
    * joined rows — no second scan, no second join. */
  def q12PriorityByStatus(spark: SparkSession, dir: String): DataFrame = {
    val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(crit, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(crit, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicate), adapted:
    * no l_shipinstruct/l_shipmode/p_container, so each disjunct is a
    * (p_brand, p_size range, l_quantity range) conjunct. The graded
    * shape — an OR of three multi-table conjuncts — is what matters:
    * the common `p_brand IN (...)` disjunct is factored out MANUALLY
    * and pushed into the broadcast part side (Catalyst doesn't extract
    * common disjuncts across tables), so at 100 TB the part build side
    * is 3 brands' worth, and the OR runs as a residual on the joined
    * row, never as a filter on the full fact×part. */
  def q19DisjunctiveRev(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val qty = col("l_quantity")
    val disj =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        qty.between(1.0, 20.0)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
        qty.between(10.0, 30.0)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(10, 40) &&
        qty.between(20.0, 40.0))
    Tables(spark, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(disj)
      .agg(revenue.cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: the
    * published query finds the sole late supplier in multi-supplier
    * F-status orders via EXISTS/NOT-EXISTS over commit/receipt dates;
    * here "late" is `l_returnflag = 'R'`. The EXISTS/NOT-EXISTS pair
    * is reformulated as its decorrelated form — ONE per-order
    * aggregate (distinct suppliers, distinct flagged suppliers)
    * joined back to the flagged rows — which is exactly what a good
    * optimizer produces and costs one orderkey shuffle instead of two
    * correlated probes. Top 20 by wait count, supplier-name
    * tiebreak. */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val lo = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val perOrder = lo.groupBy(col("l_orderkey").as("po_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("nrsupp"))
      .filter(col("nsupp") >= 2 && col("nrsupp") === 1)
    val waiting = lo.filter(col("l_returnflag") === "R")
      .join(perOrder, col("l_orderkey") === col("po_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    waiting
      .join(broadcast(Tables(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  /** TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table, so
    * the supplier↔part cost relation is DERIVED from lineitem —
    * supplycost(s, p) = MIN(l_extendedprice) over their lines, an
    * exact-DECIMAL min. The graded shape is the published one: a
    * correlated min subquery (decorrelated to per-part min + equality
    * join) selecting, per EUROPE-supplied LARGE part, the cheapest
    * regional supplier(s). The per-part min frame is a map-side-
    * combined agg; the tie compare stays in DECIMAL so both engines
    * keep identical argmin sets. At 100 TB the derived ps relation is
    * one lineitem shuffle on (part, supp); everything after is
    * broadcast-sized. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec(col("l_extendedprice"))).as("supplycost"))
    val euSupp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .join(broadcast(Tables(spark, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val parts = Tables(spark, dir, "part")
      .filter(col("p_size") === 15 && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_name"))
    val cand = ps
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
    val minPer = cand.groupBy(col("p_partkey").as("mp_partkey"))
      .agg(min(col("supplycost")).as("mincost"))
    cand.join(broadcast(minPer),
        col("p_partkey") === col("mp_partkey") &&
          col("supplycost") === col("mincost"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"),
        col("supplycost").cast("double").as("cost"))
  }

  /** TPC-H Q11 (important stock identification), adapted: partsupp
    * value becomes lineitem revenue (exact DECIMAL extendedprice sum)
    * restricted to EUROPE suppliers. The graded shape is the scalar-
    * subquery HAVING: per-part value > fraction of the global total.
    * The fraction compare is exact — value × 2000 vs total, both
    * DECIMAL (the testdata has 2000 parts, so this keeps parts above
    * the mean), no double division anywhere. The global total is a
    * 1-row aggregate broadcast over the per-part frame; at 100 TB
    * both aggregates are map-side combined on the same shuffle. */
  def q11ImportantValues(spark: SparkSession, dir: String): DataFrame = {
    val euSupp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .join(broadcast(Tables(spark, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val vals = Tables(spark, dir, "lineitem")
      .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("value_dec"))
    val total = vals.agg(sum(col("value_dec")).as("total_dec"))
    vals.join(broadcast(total),
        col("value_dec") * lit(2000) > col("total_dec"))
      .select(col("l_partkey"),
        col("value_dec").cast("double").as("part_value"))
  }

  /** TPC-H Q16 (parts/supplier relationship), adapted: the
    * supplier↔part relation derives from DISTINCT lineitem pairs; the
    * published "customer complaints" NOT-IN exclusion becomes
    * `s_acctbal < 0` suppliers (the schema's only supplier blemish).
    * The graded shape is unchanged: distinct-supplier counts per part
    * attribute group with a NOT-IN (anti-join) exclusion. The anti
    * side is tiny → broadcast; the distinct-count shuffles once on
    * the group keys. */
  def q16SupplierCount(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20 (potential part promotion), adapted: without
    * ps_availqty, "supplier holding excess stock" becomes "dominant
    * supplier" — a supplier shipping MORE THAN HALF of a red part's
    * 1996 volume (the published query's `availqty > 0.5 × shipped`
    * inequality, re-anchored on the data that exists). The graded
    * nested-IN shape survives as two stacked aggregates over the same
    * (part, supp) shuffle + a semi join into EUROPE suppliers; the
    * half compare is exact (qty × 2 vs total, both DECIMAL). */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables(spark, dir, "part")
      .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
    val sq = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
    val tq = sq.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("sq")).as("tq"))
    val dominant = sq
      .join(tq, col("l_partkey") === col("t_partkey") &&
        col("sq") * lit(2) > col("tq"))
      .select(col("l_suppkey")).distinct()
    Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
        .join(broadcast(Tables(spark, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_volume_shipping" -> q7VolumeShipping _,
    "q8_market_share" -> q8MarketShare _,
    "q10_returned_items" -> q10ReturnedItems _,
    "q14_promo_share" -> q14PromoShare _,
    "q15_top_supplier" -> q15TopSupplier _,
    "q18_large_orders" -> q18LargeOrders _,
    "q2_min_cost_supplier" -> q2MinCostSupplier _,
    "q4_order_priority" -> q4OrderPriority _,
    "q6_revenue_delta" -> q6RevenueDelta _,
    "q11_important_values" -> q11ImportantValues _,
    "q12_priority_by_status" -> q12PriorityByStatus _,
    "q16_supplier_count" -> q16SupplierCount _,
    "q19_disjunctive_rev" -> q19DisjunctiveRev _,
    "q20_dominant_supplier" -> q20DominantSupplier _,
    "q21_waiting_supplier" -> q21WaitingSupplier _)

  val oracleSql: Map[String, String] = Map(
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS volume,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND l_shipdate <  CAST('1998-01-01' AS TIMESTAMP)
        |GROUP BY 1, 2, 3""".stripMargin,
    // numerator/denominator exact DECIMAL, ONE double divide per year
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         CAST(1 - l_discount AS DECIMAL(18,2))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS mkt_share,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_volume
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region   ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        |  AND o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND o_orderdate <  CAST('1998-01-01' AS TIMESTAMP)
        |GROUP BY 1""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND o_orderdate <  CAST('1996-07-01' AS TIMESTAMP)
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """SELECT
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         CAST(1 - l_discount AS DECIMAL(18,2))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS promo_share,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND l_shipdate <  CAST('1996-07-01' AS TIMESTAMP)""".stripMargin,
    // the max-revenue tie compare stays in DECIMAL on both engines
    "q15_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(1 - l_discount AS DECIMAL(18,2))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
        |    AND l_shipdate <  CAST('1996-04-01' AS TIMESTAMP)
        |  GROUP BY 1),
        |m AS (SELECT max(rev_dec) AS max_rev FROM r)
        |SELECT s_suppkey, s_name,
        |  CAST(r.rev_dec AS DOUBLE) AS total_revenue
        |FROM r, m
        |JOIN supplier ON r.l_suppkey = s_suppkey
        |WHERE r.rev_dec = m.max_rev""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >
        |    CAST(250 AS DECIMAL(18,2)))
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(qty_dec AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN big      ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q6_revenue_delta" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue_delta,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND l_shipdate <  CAST('1997-01-01' AS TIMESTAMP)
        |  AND l_discount >= CAST(0.02 AS DOUBLE)
        |  AND l_discount <= CAST(0.04 AS DOUBLE)
        |  AND l_quantity <  CAST(24 AS DOUBLE)""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND o_orderdate <  CAST('1996-04-01' AS TIMESTAMP)
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    "q12_priority_by_status" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
        |  AND l_shipdate <  CAST('1997-01-01' AS TIMESTAMP)
        |GROUP BY 1""".stripMargin,
    "q19_disjunctive_rev" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    // decorrelated EXISTS/NOT-EXISTS: one per-order aggregate, same
    // semantics as the Spark plan by construction
    "q21_waiting_supplier" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey, l_returnflag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_order AS (
        |  SELECT l_orderkey,
        |    COUNT(DISTINCT l_suppkey) AS nsupp,
        |    COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
        |      THEN l_suppkey END) AS nrsupp
        |  FROM lo GROUP BY 1),
        |waiting AS (
        |  SELECT DISTINCT lo.l_orderkey, lo.l_suppkey
        |  FROM lo JOIN per_order ON lo.l_orderkey = per_order.l_orderkey
        |  WHERE lo.l_returnflag = 'R' AND nsupp >= 2 AND nrsupp = 1)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM waiting JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 20""".stripMargin,
    // supplycost derived from lineitem (no partsupp); DECIMAL min +
    // DECIMAL tie compare keeps the argmin set identical across engines
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cand AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, n_name, supplycost
        |  FROM ps
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN eu   ON l_suppkey = s_suppkey
        |  WHERE p_size = 15 AND p_type = 'LARGE'),
        |mc AS (SELECT p_partkey AS mp_partkey, MIN(supplycost) AS mincost
        |       FROM cand GROUP BY 1)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
        |  CAST(supplycost AS DOUBLE) AS cost
        |FROM cand JOIN mc ON p_partkey = mp_partkey
        |WHERE supplycost = mincost""".stripMargin,
    // value x 2000 vs total stays exact DECIMAL on both engines
    "q11_important_values" ->
      """WITH eu AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |vals AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
        |  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |t AS (SELECT SUM(value_dec) AS total_dec FROM vals)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
        |FROM vals, t
        |WHERE value_dec * 2000 > total_dec""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    // qty x 2 vs part total stays exact DECIMAL on both engines
    "q20_dominant_supplier" ->
      """WITH sq AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
        |    AND l_shipdate <  CAST('1997-01-01' AS TIMESTAMP)
        |  GROUP BY 1, 2),
        |tq AS (SELECT l_partkey AS t_partkey, SUM(sq) AS tq
        |       FROM sq GROUP BY 1),
        |dom AS (
        |  SELECT DISTINCT l_suppkey
        |  FROM sq JOIN tq ON l_partkey = t_partkey
        |  WHERE sq * 2 > tq)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (SELECT l_suppkey FROM dom)""".stripMargin)
}
