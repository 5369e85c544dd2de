package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H-shaped relational coverage beyond the q1/q3/q5/q9/q13/q17/q22
  * gates in [[AnalyticsQueries]]: the join/agg shapes the testdata
  * schema supports (no partsupp table, no commit/receipt dates, so
  * Q2/Q4/Q11/Q12/Q16/Q20/Q21 are unrepresentable as-published; these
  * six cover the remaining distinct plan shapes).
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_volume_shipping" -> q7VolumeShipping _,
    "q8_market_share" -> q8MarketShare _,
    "q10_returned_items" -> q10ReturnedItems _,
    "q14_promo_share" -> q14PromoShare _,
    "q15_top_supplier" -> q15TopSupplier _,
    "q18_large_orders" -> q18LargeOrders _)

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
        |JOIN customer ON o_custkey = c_custkey""".stripMargin)
}
