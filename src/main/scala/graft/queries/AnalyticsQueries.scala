package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Analytic operator coverage: hash/sort aggregation, distinct-agg,
  * multi-way joins (broadcast + shuffle), window functions, sort/top-k,
  * set ops, rollup — the operators SURVEY.md §2.4-2.6 records as absent
  * in the reference but native to the extended engine.
  *
  * Determinism across engines: every floating sum is computed in exact
  * DECIMAL arithmetic and only cast to DOUBLE at the end, so Spark's
  * shuffle order can't change the result bits vs DuckDB (SURVEY.md
  * §7.5). Top-k queries always order by a unique key suffix.
  *
  * Scale notes: group-bys partial-aggregate map-side; the dimension
  * sides of every join here (region/nation/customer at TPC-H ratios,
  * or a filtered orders) are broadcast explicitly; AQE handles skew at
  * the 100 TB end.
  */
object AnalyticsQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1-shaped scan + hash aggregate over lineitem.
    *
    * The distinct-count runs as a separate two-level aggregation joined
    * back on the (tiny) group keys: `countDistinct` alongside plain
    * aggregates plans an Expand that doubles the aggregation input —
    * at 100 TB that's the difference between one pass and two over
    * every shuffled row. The split also narrows each scan's ReadSchema. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    def filtered = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val keys = Seq("l_returnflag", "l_linestatus")
    val main = filtered
      .groupBy(keys.map(col): _*)
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    val distinctOrders = filtered
      .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_orders"))
    main.join(distinctOrders, keys)
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price"), col("sum_disc_price"), col("count_order"),
        col("n_orders"))
  }

  /** Shuffle join lineitem<->orders + broadcast customer, grouped
    * revenue, top 10 — TPC-H Q3 shaped. */
  def q3JoinTopk(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Five-way join through the region->nation->customer->orders->lineitem
    * chain with broadcast dims — TPC-H Q5 shaped. */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Window functions: rank within group + running sum over a frame. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    ord
      .withColumn("order_rank", row_number().over(w))
      .withColumn("running_spend",
        sum(dec(col("o_totalprice"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .filter(col("order_rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("order_rank"),
        col("running_spend"))
  }

  /** Event-time tumbling-window aggregation (5-minute buckets) over the
    * events stream table — the batch twin of the streaming window
    * operator (§2.9). */
  def eventsWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(
        // window start as epoch seconds: timestamps materialized by
        // to_timestamp would be TIMESTAMPTZ on the DuckDB side and
        // break the dtype-sensitive compare
        unix_timestamp(window(col("ts"), "5 minutes").getField("start"))
          .as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))

  /** Set ops + semi/anti joins: customers with orders but no high-value
    * orders (anti over semi). */
  def semiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"),
      "left_semi")
    val highValue = ord.filter(col("o_totalprice") > 400000.0)
    withOrders.join(highValue,
      withOrders("c_custkey") === highValue("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Ordered event funnel: users progressing view → click → purchase
    * in event-time order (each stage's first event must not precede
    * the previous stage's). Every stage is a selective filter + a
    * `min` hash agg + an equi-join, ALL keyed on user_id — one
    * partitioning reused across the whole funnel (no window sort over
    * the event stream, no per-user event collection), so at 100 TB
    * the funnel costs three co-partitioned passes over progressively
    * smaller stage frames. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_users"))
      .withColumn("stage", lit("view"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit("click")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit("purchase")))
      .select(col("stage"), col("n_users"))
  }

  /** Bloom-filtered semi-join (`ext.Bloom.bloomSemiJoin`): lineitem
    * rows of urgent orders, with the fact side pre-filtered at the
    * scan by a bloom sketch of the urgent order keys — the runtime-
    * filter shape that keeps 100 TB fact scans from shuffling rows a
    * selective dim join will drop anyway. The bloom stage is
    * semantically invisible (the exact semi-join absorbs its false
    * positives), so the oracle is the plain `IN` subquery. */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.ext.Bloom.bloomSemiJoin(
      li, col("l_orderkey"), urgent, col("o_orderkey"),
      expectedItems = 100000L, fpp = 0.01)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  /** Explicitly salted shuffle join (`ext.Skew.saltedJoin`): lineitem
    * scattered over (key, salt), orders replicated saltsx — the manual
    * skew-mitigation path for keys too hot even for AQE's split. The
    * salting is semantically invisible, so the oracle is the plain
    * join + aggregate. */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        col("l_extendedprice"), col("l_discount"))
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    graft.ext.Skew.saltedJoin(li, ord, "o_orderkey", salts = 4)
      .groupBy(col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Exact grouped quantiles: Spark's sort-based `percentile` and
    * DuckDB's `quantile_cont` share the same linear-interpolation
    * definition (rank = p*(n-1)), so results hash-match bit-for-bit on
    * the integral l_quantity values. The approximate path for 100 TB
    * is `approx_percentile` (t-digest) — same query shape, not
    * oracle-comparable across engines by construction. */
  def quantilesAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        count(lit(1)).as("n"))

  /** The 100 TB approximate-aggregate path, gated: `percentile_approx`
    * (t-digest) and `approx_count_distinct` (HyperLogLog++) cannot
    * hash-match an exact engine by construction, but their ERROR BOUNDS
    * can — each group emits `approx within ε of exact` booleans, which
    * are deterministic (the approx algorithms are deterministic for a
    * given input, and the bounds hold with huge margin: t-digest
    * accuracy 10000 ⇒ rank error ≤ n/10000, checked against the exact
    * ±1-percentile value band; HLL rsd 5% checked at 15%). The oracle
    * is the constant-true frame with the exact group count — so a
    * regression in either sketch breaks the gate.
    *
    * Same Expand-avoidance as [[q1Agg]]: the exact distinct count runs
    * as its own two-level aggregation joined back on the tiny key. */
  def quantilesApproxBounds(spark: SparkSession, dir: String): DataFrame = {
    def li = Tables(spark, dir, "lineitem")
    val main = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("aq50"),
        expr("percentile(l_quantity, 0.49)").as("lo"),
        expr("percentile(l_quantity, 0.51)").as("hi"),
        approx_count_distinct(col("l_orderkey")).as("acd"),
        count(lit(1)).as("n"))
    val exactCd = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cd"))
    main.join(exactCd, "l_returnflag")
      .select(col("l_returnflag"),
        (col("aq50") >= col("lo") && col("aq50") <= col("hi"))
          .as("q50_within_eps"),
        (abs(col("acd") - col("cd")) <= col("cd") * lit(0.15))
          .as("cd_within_eps"),
        col("n"))
  }

  /** Heavy-hitter sketch with a containment gate: `freqItems` (the
    * one-pass Karp–Shenker–Papadimitriou summary, merged map-side —
    * the 100 TB path for "which values dominate this column") is
    * approximate-with-a-one-sided-guarantee: it may over-report, but
    * every value with frequency > support·n IS in its output. That
    * guarantee is what gets gated: exact per-value counts (computed
    * independently) joined against the sketch output must show every
    * true heavy hitter captured — a `captured` boolean that the
    * constant-true oracle hash-pins, alongside the exact counts. The
    * sketch result is one tiny row (collected by the API itself);
    * everything else is one map-side-combined count. */
  def freqItemsBounds(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select(col("event_type"))
    val sketch = ev.stat.freqItems(Seq("event_type"), 0.1)
      .select(explode(col("event_type_freqItems")).as("event_type"))
      .withColumn("in_sketch", lit(true))
    val exact = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt"))
        .over(Window.partitionBy()))
    exact.join(broadcast(sketch), Seq("event_type"), "left")
      .select(col("event_type"), col("cnt"),
        (col("cnt") > col("total") * lit(0.1)).as("is_heavy"),
        (!(col("cnt") > col("total") * lit(0.1)) ||
          coalesce(col("in_sketch"), lit(false))).as("captured"))
  }

  /** Rollup aggregation (grouping sets) over orders. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))

  /** Per-group OLS regression (value over time) from exact power
    * sums — "the trend per segment" in one map-side-combined
    * aggregate, the same algebraic-state shape as [[q1Agg]] and
    * `stats_agg`'s moments: slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²),
    * intercept from the means. Every sum is exact DECIMAL over
    * INTEGRAL x (epoch days — a double x would make Σx order-
    * dependent) and scale-2 y; the closed-form division happens ONCE
    * in doubles on textually identical operands, so both engines
    * emit identical bits. No builtin regr_slope on either side — the
    * open-book sums ARE the cross-engine contract (and the mergeable
    * state a 100 TB incremental fit would persist). */
  def groupedRegression(spark: SparkSession, dir: String): DataFrame = {
    // epoch DAYS via integral FLOOR division. Spark's `div` truncates
    // toward zero while DuckDB's `//` floors, so a pre-1970 (negative
    // epoch) ts would diverge by one day. Subtracting the always-non-
    // negative pmod first makes the numerator an exact multiple of the
    // divisor, where truncation == floor — pure integer arithmetic,
    // sign-correct on both engines.
    val x = expr(
      "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
      .cast("decimal(20,0)")
    val y = col("value").cast("decimal(18,2)")
    Tables(spark, dir, "events")
      .select(col("event_type"), x.as("x"), y.as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope"),
        col("sx").cast("double").as("sxd"),
        col("sy").cast("double").as("syd"))
      .select(col("event_type"), col("n"), col("slope"),
        ((col("syd") - col("slope") * col("sxd")) / col("n").cast("double"))
          .as("intercept"))
  }

  /** Cross-series Pearson correlation matrix over hourly event-type
    * activity — "which metrics move together", the time-series
    * companion of [[groupedRegression]]. Hourly counts per type are
    * densified onto the full hour×type grid (missing hours count 0 —
    * true time-series semantics, not co-observed-only), paired by a
    * self-join on the hour, and reduced to exact integer power sums;
    * corr = (n·sxy − sx·sy) / (√(n·sxx − sx²)·√(n·syy − sy²)) with
    * DECIMAL sums cast to double once — IEEE *, /, sqrt are correctly
    * rounded, so the value is bit-identical cross-engine. Zero
    * variance ⇒ NULL on both engines (no double division by zero).
    *
    * Scale: the count aggregate is map-side combined; the grid is
    * |hours| × |types| (types broadcast); the pair join fans out
    * |types|² per hour — bounded by the type vocabulary, never by
    * event volume. Power sums are the mergeable state: an incremental
    * refresh adds today's hour rows and re-reduces. */
  def hourlyCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val hr = expr(
      "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000")
    val counts = Tables(spark, dir, "events")
      .select(hr.as("h"), col("event_type"))
      .groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val cm = graft.Tables.materialize(counts)
    val fullGrid = cm.select(col("h")).distinct()
      .crossJoin(broadcast(cm.select(col("event_type")).distinct()))
      .join(cm, Seq("h", "event_type"), "left_outer")
      .select(col("h"), col("event_type"),
        coalesce(col("c"), lit(0L)).cast("decimal(20,0)").as("c"))
    val pairs = fullGrid.as("a").join(fullGrid.as("b"),
        col("a.h") === col("b.h") &&
          col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.c").as("x"), col("b.c").as("y"))
    def d(c: Column) = c.cast("double")
    pairs.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("type_a"), col("type_b"), col("n"),
        when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          d(col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(d(col("n") * col("sxx") - col("sx") * col("sx"))) *
              sqrt(d(col("n") * col("syy") - col("sy") * col("sy")))))
          .as("corr"))
  }

  /** Conversion-window funnel — [[funnelSteps]] with the semantics a
    * product-analytics funnel actually uses: each later step must
    * land within 48 h of the previous step's completion, not just
    * after it (an eventual purchase a month later is NOT this
    * funnel's conversion). Same co-partitioned conditional-min chain,
    * pure integer micros bounds. */
  def funnelWindowed(spark: SparkSession, dir: String): DataFrame = {
    val win = 48L * 3600L * 1000000L
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") >= col("t_view") && col("us") <= col("t_view") + win)
      .groupBy("user_id").agg(min(col("us")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") >= col("t_click") &&
        col("us") <= col("t_click") + win)
      .groupBy("user_id").agg(min(col("us")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("view"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit("click")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit("purchase")))
      .select(col("stage"), col("n_users"))
  }

  /** First-touch attribution — every user's lifetime purchase revenue
    * credited to their FIRST event type (the acquisition channel
    * stand-in): the marketing-attribution readout. First touch is a
    * row_number over the per-user (us, event_id) total order; revenue
    * folds in exact DECIMAL and casts to double once. */
  def firstTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("value"))
    val first = ev.withColumn("rk", row_number().over(byUser))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("first_touch"))
    val rev = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("np"),
        sum(col("value").cast("decimal(18,2)")).as("revd"))
    first.join(rev, Seq("user_id"), "left_outer")
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("np"), lit(0L))).as("n_purchases"),
        sum(coalesce(col("revd"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("revenue"))
  }

  /** Conversion-lag histogram — how long users take from first 'view'
    * to their first SUBSEQUENT 'purchase', bucketed to whole days:
    * the time-to-convert distribution a funnel readout pairs with
    * [[abTestZscore]]. Sequencing is the two-phase conditional-min
    * chain (first view per user, then min purchase strictly after
    * it) — both joins co-partition on user_id; lag stays integer
    * micros ÷ day (positive, so trunc == floor on both engines). */
  def conversionLagHist(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"))
    firstView.join(buys, "user_id")
      .filter(col("us") > col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("us")).as("t_buy"))
      .select(expr("(t_buy - t_view) div 86400000000").as("lag_days"))
      .groupBy(col("lag_days")).agg(count(lit(1)).as("n_users"))
  }

  /** Association rules over per-user event-type incidence — "users
    * who did A also did B": support, both-direction confidence, and
    * lift per unordered type pair, all from exact distinct-user
    * counts with one IEEE divide each (operand order mirrored in the
    * oracle). Lift > 1 = positive association.
    *
    * Scale: one distinct on (user, type) — the only event-volume
    * shuffle — then a self-join keyed on user whose fan-out is
    * |types-per-user|², bounded by the type vocabulary; N broadcasts
    * as a 1-row frame. The basket-analysis shape: swap event types
    * for SKUs and this is market-basket mining unchanged. */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val inc = graft.Tables.materialize(
      Tables(spark, dir, "events")
        .select(col("user_id"), col("event_type")).distinct())
    val totals = inc.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"))
    val pairs = inc.as("a").join(inc.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    val nUsers = inc.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    def d(c: Column) = c.cast("double")
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(totals.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"),
        col("n_a"), col("n_b"), col("n_ab"), col("n_users"),
        (d(col("n_ab")) / d(col("n_users"))).as("support"),
        (d(col("n_ab")) / d(col("n_a"))).as("conf_ab"),
        (d(col("n_ab")) / d(col("n_b"))).as("conf_ba"),
        (d(col("n_ab")) * d(col("n_users")) /
          (d(col("n_a")) * d(col("n_b")))).as("lift"))
  }

  /** Top user-journey trigrams — the most common 3-step event
    * sequences across all users ("view > click > purchase"), the
    * path-analysis readout behind funnel discovery. Consecutive
    * triples come from two LEAD windows per user on the total
    * (ts, event_id) order; the global cut is a TakeOrdered on
    * (count desc, trigram asc) — a total order, so the top-20
    * boundary is deterministic.
    *
    * Scale: one hash shuffle on user_id + per-user sort (bounded by
    * per-user event count); the trigram aggregate is map-side
    * combined over a |types|³-bounded key domain. */
  def journeyTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(byUser))
      .withColumn("e3", lead(col("event_type"), 2).over(byUser))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("trigram"))
      .groupBy(col("trigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram").asc)
      .limit(20)
  }

  /** Two-proportion A/B readout — the experiment-analysis primitive:
    * users split into deterministic variants (user_id mod 2 stands in
    * for the assignment hash), conversion = reached 'purchase', and
    * the two-sample pooled z-score
    * z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)).
    * Counts are exact integers; the z is a fixed dag of IEEE divides,
    * one subtract chain and one sqrt over them — operand order
    * mirrored in the oracle, so the score hash-matches bit-exact.
    *
    * Scale: two distinct-aggregates on user_id (co-partitioned — the
    * second reuses the first's shuffle under AQE) collapsed to ONE
    * 2-row frame, then a 1-row fused readout; nothing downstream of
    * the per-user distinct ever sees event volume. */
  def abTestZscore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"))
    val users = ev.select(col("user_id")).distinct()
      .withColumn("variant", pmod(col("user_id"), lit(2)))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("converted", lit(1L))
    val per = users.join(conv, Seq("user_id"), "left_outer")
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("converted"), lit(0L))).as("c"))
    val one = per.agg(
      sum(when(col("variant") === 0, col("n"))).as("n_a"),
      sum(when(col("variant") === 0, col("c"))).as("c_a"),
      sum(when(col("variant") === 1, col("n"))).as("n_b"),
      sum(when(col("variant") === 1, col("c"))).as("c_b"))
    def d(c: Column) = c.cast("double")
    val pa = d(col("c_a")) / d(col("n_a"))
    val pb = d(col("c_b")) / d(col("n_b"))
    val pp = d(col("c_a") + col("c_b")) / d(col("n_a") + col("n_b"))
    one.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      pa.as("cr_a"), pb.as("cr_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        (pa - pb) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))))
        .as("z"))
  }

  /** Hash-deterministic bootstrap confidence interval for the mean
    * order value — uncertainty quantification without rand(): B = 20
    * m-out-of-n resamples, membership decided by
    * hash32(b|orderkey) % 2 (each resample is an independent ~n/2
    * content-hash subsample, reproducible on any engine/partitioning),
    * CI = the 5th/95th percentile_disc over the resample means. The
    * generator fan-out (×B) is map-side only and collapses to B
    * groups at the first aggregate, so the plan costs one pass over
    * the fact table regardless of B; resample means are integer-cent
    * sums (< 2⁵³, exact) under one fixed divide — hash-gateable. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val B = 20
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    val means = ord
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(0), lit(B - 1))).as("b"))
      .filter(graft.functions.TextFunctions.hash32(
        concat_ws("|", col("b"), col("o_orderkey"))) % 2 === 0)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_b"), sum(col("cents")).as("s_b"))
      .select((col("s_b").cast("double") / col("n_b").cast("double"))
        .as("m_b"))
    val ci = means.agg(count(lit(1)).as("n_resamples"),
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY m_b)")
        .as("mean_lo"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY m_b)")
        .as("mean_hi"))
    val full = ord.agg(
      (sum(col("cents")).cast("double") / count(lit(1)).cast("double"))
        .as("mean_full"))
    ci.crossJoin(full)
  }

  /** Chi-square distribution-drift monitor — the data-quality check a
    * pipeline runs between ingestion windows: does the event-type mix
    * of the second half of the time range differ from the first? Per
    * type, observed first/second-half counts vs the homogeneity
    * expectation e = rowTotal·colTotal/N, reported as the per-type
    * χ² contribution (the full statistic is their sum; large
    * contributions name the drifting types, which is what an alert
    * needs).
    *
    * Exactness: all counts are integers from two map-side-combined
    * aggregates (per-type×half counts + the 1-row totals, broadcast
    * back); the midpoint split is integer arithmetic on epoch
    * seconds; expectations and contributions are ONE fixed IEEE
    * multiply/divide tree over exact-below-2⁵³ integer products —
    * hash-gateable. Nothing downstream of the first aggregate sees
    * event volume. */
  def chisqDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), unix_timestamp(col("ts")).as("s"))
    val mid = ev.agg(expr("(min(s) + max(s)) DIV 2").as("mid"))
    val per = ev.crossJoin(broadcast(mid))
      .withColumn("h", when(col("s") < col("mid"), 1L).otherwise(2L))
      .groupBy(col("event_type"))
      .agg(sum(when(col("h") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("h") === 2, 1L).otherwise(0L)).as("n_second"))
    val tot = per.agg(sum(col("n_first")).as("t1"),
      sum(col("n_second")).as("t2"))
    def d(c: Column) = c.cast("double")
    val e1 = d(col("n_first") + col("n_second")) * d(col("t1")) /
      d(col("t1") + col("t2"))
    val e2 = d(col("n_first") + col("n_second")) * d(col("t2")) /
      d(col("t1") + col("t2"))
    per.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_first"), col("n_second"),
        e1.as("e_first"),
        (when(e1 > 0, (d(col("n_first")) - e1) * (d(col("n_first")) - e1)
            / e1).otherwise(lit(0.0))
          + when(e2 > 0, (d(col("n_second")) - e2)
              * (d(col("n_second")) - e2) / e2).otherwise(lit(0.0)))
          .as("chisq_contrib"))
  }

  /** CUSUM change-point detection over the daily event-count series,
    * kept INTEGER-exact: for day index i of D days with cumulative
    * count S_i and total T, the scaled statistic
    * D·S_i − i·T  ==  D² · (classic CUSUM of deviations from the
    * daily mean) — same argmax, no doubles anywhere, so the detected
    * change day hash-gates exactly. Days with no events are densified
    * to zero (a silent outage IS a level shift; dropping those rows
    * would hide exactly the change points that matter).
    *
    * Scale: daily counts are one map-side-combined aggregate — the
    * window work downstream runs on |days|×|types| rows, never event
    * volume. The per-type sequential scan is a window over a few
    * thousand rows per partition at any corpus size. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val day = expr(
      "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
    val daily = Tables(spark, dir, "events")
      .select(col("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val dm = graft.Tables.materialize(daily)
    val grid = dm.select(col("day")).distinct()
      .crossJoin(broadcast(dm.select(col("event_type")).distinct()))
      .join(dm, Seq("day", "event_type"), "left_outer")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val cum = grid
      .withColumn("cum", sum(col("n")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("i", row_number().over(byDay).cast("long"))
    val tot = grid.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("days"))
    val scored = cum.join(broadcast(tot), "event_type")
      .withColumn("cusum_scaled",
        col("days") * col("cum") - col("i") * col("total"))
    val best = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum_scaled")).desc, col("day").asc)
    scored.withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("cusum_scaled"), col("days"), col("total"))
  }

  /** Seasonal decomposition of the daily event series — the
    * trend/seasonality split behind traffic forecasting and anomaly
    * baselines: per event type, a 7-observation centered moving
    * average detrends the densified daily counts, and the mean
    * deviation per day-of-week is the seasonal index (which weekday
    * runs hot). Kept INTEGER-exact until the final readout: the
    * deviation is computed ×7 (7·n − windowSum, both integers), so
    * the only float is ONE division chain at the end — no
    * order-dependent double summation anywhere ([[cusumChangepoint]]'s
    * discipline). Edge days without a full 7-row window are excluded
    * (the standard centered-MA convention).
    *
    * Scale: daily counts are one map-side-combined aggregate; all
    * window work runs on |days|×|types| rows. */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val day = expr(
      "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
    val daily = Tables(spark, dir, "events")
      .select(col("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val dm = graft.Tables.materialize(daily)
    val grid = dm.select(col("day")).distinct()
      .crossJoin(broadcast(dm.select(col("event_type")).distinct()))
      .join(dm, Seq("day", "event_type"), "left_outer")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    grid
      .withColumn("wsum", sum(col("n")).over(w7))
      .withColumn("wcnt", count(lit(1)).over(w7))
      .filter(col("wcnt") === 7)
      .withColumn("dev_x7", lit(7L) * col("n") - col("wsum"))
      .groupBy(col("event_type"), pmod(col("day"), lit(7L)).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("dev_x7")).as("sum_dev_x7"))
      .withColumn("seas_dev",
        col("sum_dev_x7").cast("double") / col("n_days").cast("double")
          / lit(7.0))
  }

  /** Q13-shaped engagement distribution: how many customers placed
    * exactly k orders — INCLUDING the zero-order customers a plain
    * join silently drops (the left-outer + coalesce(0) is the whole
    * point of the shape; "inactive users" are the most-watched bar of
    * the histogram). Two aggregates + one left join, all integer. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    Tables(spark, dir, "customer").select(col("c_custkey"))
      .join(perCust, Seq("c_custkey"), "left_outer")
      .select(coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_custs"))
  }

  /** Q22-shaped prospect analysis: customers with above-average
    * positive balance and no URGENT order on file (at TPC-H density
    * every customer has SOME order, so the plain "no orders" filter
    * degenerates to empty; "never urgent" keeps the identical
    * scalar-subquery + anti-join composition while selecting a real
    * population), grouped by nation. The threshold is ONE exact-
    * decimal sum divided once as doubles (operand order mirrored in
    * the oracle), broadcast as a 1-row frame; the anti-join runs at
    * fact-table scale. */
  def q22Prospects(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("thr"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")).distinct(),
        Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_prospects"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("total_bal"))
  }

  /** Cohort LTV curves — cumulative purchase revenue per signup-week
    * cohort by week offset: [[cohortRetention]]'s revenue twin, the
    * payback-period readout. Revenue folds in exact DECIMAL; the
    * cumulative is a per-cohort ROWS window over the (small) offset
    * domain, still in DECIMAL, cast to double once at the end — so
    * the whole curve hash-gates bit-exact. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val week = expr("unix_micros(ts) div 604800000000")
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        week.as("wk"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_week"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("revd"),
        count(lit(1)).as("n_purchases"))
    val w = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum_revenue", sum(col("revd")).over(w))
      .select(col("cohort_week"), col("week_offset"), col("n_purchases"),
        col("revd").cast("double").as("revenue"),
        col("cum_revenue").cast("double").as("cum_revenue"))
  }

  /** Growth accounting — each day's active users classified as NEW
    * (first-ever activity), RETURNING (also active within the prior
    * 7 days) or RESURRECTED (back after a 7+ day gap): the canonical
    * product-growth decomposition. One distinct to user-day grain,
    * then a per-user LAG and the first-day aggregate, both
    * co-partitioned on user_id (one shuffle serves the window and the
    * join); all comparisons are integer day arithmetic. */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val day = expr(
      "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
    val active = Tables(spark, dir, "events")
      .select(col("user_id"), day.as("day")).distinct()
    val firstDay = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    active.withColumn("prev_day", lag(col("day"), 1).over(w))
      .join(firstDay, "user_id")
      .select(col("day"),
        when(col("day") === col("first_day"), lit("new"))
          .when(col("prev_day") >= col("day") - 7, lit("returning"))
          .otherwise(lit("resurrected")).as("status"))
      .groupBy(col("day"), col("status"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Activity heatmap — the day-of-week × hour-of-day usage matrix
    * every product dashboard opens with. Both axes are PURE integer
    * arithmetic from epoch micros (dow 0=Monday via (days+3) mod 7 —
    * 1970-01-01 was a Thursday; engine dayofweek() functions disagree
    * on week start and are avoided entirely). One map-side-combined
    * aggregate over a 168-cell key domain. */
  def activityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val days = expr(
      "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
    Tables(spark, dir, "events")
      .select(pmod(days + 3, lit(7)).as("dow"),
        pmod(expr(
          "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000"),
          lit(24)).as("hour"),
        col("value"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
  }

  /** Seasonal-naive forecast backtest — the capacity-planning sanity
    * baseline every forecasting effort must beat: predict each day's
    * event count with the count seven days earlier, score MAE and
    * mean bias per type over the densified daily grid (missing days
    * are real zeros on both the target and predictor sides). Errors
    * stay exact integers; MAE/bias are one IEEE divide each. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val day = expr(
      "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
    val daily = Tables(spark, dir, "events")
      .select(col("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val dm = graft.Tables.materialize(daily)
    val grid = dm.select(col("day")).distinct()
      .crossJoin(broadcast(dm.select(col("event_type")).distinct()))
      .join(dm, Seq("day", "event_type"), "left_outer")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
    val scored = grid.as("t").join(grid.as("p"),
        col("t.event_type") === col("p.event_type") &&
          col("t.day") === col("p.day") + 7)
      .select(col("t.event_type").as("event_type"),
        (col("t.n") - col("p.n")).as("err"))
    def d(c: Column) = c.cast("double")
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("err"))).as("total_abs"),
        sum(col("err")).as("total_err"))
      .select(col("event_type"), col("n_days"), col("total_abs"),
        col("total_err"),
        (d(col("total_abs")) / d(col("n_days"))).as("mae"),
        (d(col("total_err")) / d(col("n_days"))).as("bias"))
  }

  /** Ratio-to-report: each order's share of its priority class's
    * total spend plus the class total — the windowed share-of-total
    * every BI layer asks for. One hash shuffle on the (tiny-domain)
    * partition key; the aggregate window needs no ORDER BY, so no
    * sort at all. Share = exact-decimal sums divided once as doubles
    * (same operands both engines => identical bits). */
  def ratioToReport(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .as("class_total_dec"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"),
        col("class_total_dec").cast("double").as("class_total"),
        (col("o_totalprice") / col("class_total_dec").cast("double"))
          .as("share"))
  }

  /** Count-min sketch as a RELATIONAL frame — the streaming-friendly
    * point-frequency estimator built entirely from dataframe state
    * (no driver-side sketch object, no binary blob): d=4 portable
    * md5-derived hash rows x w=256 buckets, each cell one count from
    * ONE map-side-combined aggregate over the (seed x event) explode.
    * Probing joins each key's (seed, bucket) coordinates back and
    * takes min over the d rows. Because the hash family is the
    * engine-portable md5 convention, the whole sketch — not just its
    * error bound — is deterministic and hash-gated against DuckDB
    * building the identical sketch in SQL. `never_under` pins the
    * CMS one-sided guarantee (an estimate can only overcount).
    *
    * At 100 TB the sketch frame is d*w rows regardless of input size
    * (vs the key-cardinality cost of the exact count it approximates)
    * and merges across partitions/days by cell-wise addition — the
    * same algebraic-state argument as `incremental_agg`. */
  /** Exploded CMS hash coordinates (d rows per input row: seed +
    * md5-derived bucket) — the shared coordinate algebra behind the
    * batch sketch below and the streaming build (`stream_cms`).
    * Appends `seed`/`bucket` columns; all input columns ride along. */
  def cmsCoords(df: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    def bucket(seed: Int, k: Column): Column =
      pmod(TextFunctions.hash32(
        concat(lit(seed.toString), lit("|"), k.cast("string"))), lit(w))
    df.withColumn("_c", explode(array((0 until d).map(s =>
        struct(lit(s).as("seed"), bucket(s, key).as("bucket"))): _*)))
      .withColumn("seed", col("_c.seed"))
      .withColumn("bucket", col("_c.bucket"))
      .drop("_c")
  }

  /** Join-cardinality estimation by CMS inner product — the classic
    * AMS-family application: |A ⋈ B| on a key equals the inner
    * product of the two key-frequency vectors, and the sketch
    * estimate min_seed Σ_b A_s[b]·B_s[b] is a ONE-SIDED overestimate
    * (every colliding pair only adds), which the gate pins per seed
    * with `never_under` alongside the exact truth.
    *
    * This is how a 100 TB planner sizes a join without running it:
    * each side's sketch is one map-side-combined aggregate over its
    * keys (d·w rows of state, mergeable across partitions/days), and
    * the estimate joins two d·w-row frames — constant cost regardless
    * of data volume. The exact truth here (per-key count join) is the
    * audit, feasible at gate scale. */
  def cmsJoinSize(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 256
    def cells(df: DataFrame, key: Column): DataFrame =
      cmsCoords(df.select(key.as("k")), col("k"), d, w)
        .groupBy(col("seed"), col("bucket"))
        .agg(count(lit(1)).as("n"))
    val ca = cells(Tables(spark, dir, "orders"), col("o_orderkey"))
    val cb = cells(Tables(spark, dir, "lineitem"), col("l_orderkey"))
      .withColumnRenamed("n", "nb")
    val est = ca.join(cb, Seq("seed", "bucket"))
      .groupBy(col("seed"))
      .agg(sum(col("n") * col("nb")).as("cms_est"))
    val truth = Tables(spark, dir, "orders")
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("na"))
      .join(Tables(spark, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("nl"))
        .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      .agg(sum(col("na") * col("nl")).as("true_size"))
    est.crossJoin(broadcast(truth))
      .select(col("seed"), col("cms_est"), col("true_size"),
        (col("cms_est") >= col("true_size")).as("never_under"))
  }

  def cmsPointEstimates(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 256
    val ev = Tables(spark, dir, "events").select(col("user_id"))
    val cells = cmsCoords(ev, col("user_id"), d, w)
      .groupBy(col("seed"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val truth = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
    val probes = cmsCoords(truth, col("user_id"), d, w)
    probes.join(cells, Seq("seed", "bucket"))
      .groupBy(col("user_id"), col("true_n"))
      .agg(min(col("n")).as("cms_est"))
      .select(col("user_id"), col("true_n"), col("cms_est"),
        (col("cms_est") >= col("true_n")).as("never_under"))
  }

  /** HyperLogLog as a RELATIONAL frame, exactly cross-engine-gated —
    * the mergeable distinct-count state behind
    * `approx_count_distinct`, built open-book: m=64 registers per
    * group, register j = max over keys hashing to j of the leading-
    * zero rank of the remaining hash bits. Rank uses `length(bin(h))`
    * — an integer string length, bit-stable on any engine — never
    * log(). The raw estimate α·m²/Σ2^-M_j stays deterministic because
    * every 2^-M_j is an exact dyadic double (1.0 / (1 << M), exact
    * IEEE divide) and their sum has no rounding at these magnitudes,
    * so even the DOUBLE estimate hash-matches DuckDB computing the
    * textually identical formula. No small-range ln() correction on
    * purpose (ln is not cross-engine bit-stable; the raw estimate is
    * the deterministic part) — `approx_count_distinct` remains the
    * production path, this is its auditable twin. Register state is
    * m rows per group, merges by cell-wise max — the same
    * algebraic-state argument as `incremental_agg` and the CMS. */
  /** HLL register frame (group, bucket, reg) for m=64 — the shared
    * register algebra behind the batch estimate below and the
    * streaming build (`stream_hll`). bucket = h mod 64; rank =
    * leading zeros of the remaining 26 bits + 1 = 27 − bitlength
    * (rest); rest == 0 → rank 27. State merges by cell-wise MAX —
    * idempotent, so even re-delivered data cannot move it. */
  def hllRegisters(df: DataFrame, group: Column, key: Column): DataFrame = {
    val h = df.select(group.as("g"),
      TextFunctions.hash32(key.cast("string")).as("h"))
    h.select(col("g"),
        pmod(col("h"), lit(64)).as("bucket"),
        shiftright(col("h"), 6).as("rest"))
      .select(col("g"), col("bucket"),
        when(col("rest") === 0, lit(27))
          .otherwise(lit(27) - length(bin(col("rest")))).as("rank"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rank")).as("reg"))
  }

  def hllDistinctEstimates(spark: SparkSession, dir: String): DataFrame = {
    val m = 64
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"))
    val regs = hllRegisters(ev, col("event_type"), col("user_id"))
      .withColumnRenamed("g", "event_type")
    val est = regs.groupBy(col("event_type"))
      .agg(sum(expr("double(1.0) / double(shiftleft(1L, reg))"))
          .as("isum"),
        count(lit(1)).as("nz"))
      // empty buckets (no key hashed there) contribute 2^-0 = 1 each
      .select(col("event_type"),
        (col("isum") + (lit(m) - col("nz")).cast("double")).as("zsum"),
        col("nz"))
      .select(col("event_type"),
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
          * lit(64.0) * lit(64.0) / col("zsum")).as("hll_est"),
        col("nz").as("buckets_hit"))
    val exact = ev.distinct().groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("hll_est"), col("buckets_hit"),
        col("n_exact"))
  }

  /** [[hllDistinctEstimates]] through the CUSTOM AGGREGATE FUNCTION:
    * `graft_hll_est` ([[graft.functions.HllEstAgg]], a
    * TypedImperativeAggregate over a fixed 64-byte register buffer,
    * registered via SparkSessionExtensions and called through the SQL
    * function surface). Same open-book algebra, but the register
    * frame never materializes — partial aggregation folds 64-byte
    * sketches map-side and merges them by cell-wise max, the
    * mergeable-state rollup shape at any scale. The gate pins the
    * imperative fold bit-equal to the relational twin's oracle. */
  def hllAggNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"))
    val est = ev.select(col("event_type"),
        TextFunctions.hash32(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(expr("graft_hll_est(h)").as("hll_est"))
    val exact = ev.distinct().groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("hll_est"), col("n_exact"))
  }

  /** Ordered per-user event-type sequence — the secondary-sort export
    * every training-sequence / session-replay pipeline ends with
    * ("user's journey as a token path"). Distributed shape: ONE hash
    * shuffle on user_id and no window, no global sort — collect_list
    * gathers (us, event_id, event_type) structs in whatever partition
    * order arrives, and one in-memory `sort_array` per group erases
    * that nondeterminism (struct comparison orders by (us, event_id),
    * unique per event). Per-group memory is bounded by the user's
    * event count — the same bound any per-user sequence model already
    * implies; a pathological user is cut off deterministically by the
    * optional `maxEventsPerUser` cap (see [[userEventPathsCapped]]).
    * NULL event times are excluded on BOTH engine and oracle sides:
    * Spark's struct sort orders null fields first while string_agg's
    * ORDER BY defaults NULLS LAST, so a null ts would silently
    * diverge — the filter pins the semantics instead. */
  def userEventPaths(spark: SparkSession, dir: String): DataFrame =
    userEventPathsCapped(spark, dir, maxEventsPerUser = None)

  /** [[userEventPaths]] with an optional hard per-user cap: keep the
    * FIRST k events by (us, event_id) — deterministic, so re-runs and
    * engine comparisons agree — and drop the rest before the
    * collect_list, bounding per-group state even when upstream quota
    * sampling is absent. The cap path costs one extra per-user sort
    * (window row_number); the uncapped path keeps the sort-free
    * single-shuffle shape. */
  def userEventPathsCapped(spark: SparkSession, dir: String,
      maxEventsPerUser: Option[Int]): DataFrame = {
    val base = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val capped = maxEventsPerUser.fold(base) { k =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      base.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
    }
    capped
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws(">",
          transform(
            sort_array(collect_list(
              struct(col("us"), col("event_id"), col("event_type")))),
            s => s.getField("event_type"))).as("path"))
  }

  /** Gap-based sessionization (10-minute inactivity gap) via
    * lag + running-sum window — the batch twin of streaming session
    * windows. Timestamp math in exact microseconds. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w) >= 600000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("session_start_us"),
        max(col("us")).as("last_event_us"))
  }

  /** Interval coalescing (gaps-and-islands): each event opens a
    * 2-minute activity interval; overlapping/touching intervals per
    * user merge into islands. The merge is the classic running-max
    * shape — an interval starts a new island iff its start exceeds the
    * max end over ALL preceding intervals (not just the previous one:
    * a long interval can span several short successors) — so the whole
    * operator is one user_id exchange, one sort, two window passes and
    * a hash aggregate; no self-join. The same sort serves both
    * windows. */
  def intervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s").asc, col("e").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + lit(120000000L)).as("e"))
      .withColumn("brk",
        when(col("s") > max(col("e"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), 1)
          .otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("start_us"), max(col("e")).as("end_us"),
        count(lit(1)).as("n_iv"))
  }

  /** Running distinct count over a window — an operator Spark has no
    * native form for (`countDistinct` is not allowed over a frame).
    * Expressed as `size(collect_set)` over the running frame: correct
    * because set size is order-insensitive, and scale-safe ONLY when
    * the distinct domain is bounded (event types here; cardinality ≤
    * |domain| per state). For unbounded domains the right tool is the
    * sketch path (HLL per frame), not this operator — documented here
    * as the operator's contract. One shuffle, one sort. */
  def windowCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .select(col("user_id"), col("event_id"), col("us"),
        size(collect_set(col("event_type")).over(w)).cast("long")
          .as("n_types_seen"))
  }

  /** Robust outlier stats per event type: median, median absolute
    * deviation (exact), and the count of |x - median| > 3·MAD
    * outliers. Exact MAD is inherently two dependent aggregation
    * passes (median first, then the deviation median) plus the flag
    * pass — three scans, each pruned to two columns; the group frame
    * between passes is tiny and broadcast. The 100 TB variant swaps
    * `percentile` for `percentile_approx` with the same plan shape.
    * Double arithmetic is identical on both engines: same interpolated
    * quantile formula (proven by [[quantilesAgg]]), same |x-m|
    * subtraction order. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    ev.join(broadcast(med), "event_type")
      .join(broadcast(dev), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("med")) > lit(3) * col("mad"),
          1L).otherwise(0L)).as("n_outliers"),
        max(col("med")).as("med"), max(col("mad")).as("mad"))
  }

  /** Deterministic per-group mode: the most frequent event type per
    * user, ties broken lexicographically — `mode()` built-ins are
    * tie-nondeterministic on BOTH engines, so the operator is the
    * count + argmin-rank composition instead. The row_number window
    * runs over the PRE-AGGREGATED counts frame (|users|×|types| rows,
    * not |events|), so the only full-data pass is the map-side-combined
    * count; the window sort touches a frame already ~|domain|× smaller
    * than the input. */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("n").desc, col("event_type").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"),
        col("n").as("mode_n"))
  }

  /** First-order transition (Markov bigram) counts over each user's
    * event sequence: one user_id exchange + sort for the lag, then a
    * map-side-combined count — the session-path / next-event-model
    * feature extraction shape. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("curr"))
      .agg(count(lit(1)).as("n"))
  }

  /** SCD2 history build from a change stream: each user's event stream
    * becomes validity intervals [valid_from, valid_to) of the
    * `event_type` state, with consecutive duplicate states collapsed
    * (the slowly-changing-dimension shape a CDC feed materializes
    * into). Both windows share one (user_id)×(us, event_id) sort, so
    * the collapse filter and the `lead` run off a single shuffle+sort;
    * at 100 TB that is one exchange of the change log, no self-join.
    * The open interval's end is MaxLong rather than NULL so the gate's
    * row-sort and hash see a total order. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull ||
        col("prev_state") =!= col("event_type"))
      .withColumn("valid_to_us",
        coalesce(lead(col("us"), 1).over(w), lit(Long.MaxValue)))
      .select(col("user_id"), col("event_type").as("state"),
        col("us").as("valid_from_us"), col("valid_to_us"))
  }

  /** Weekly cohort retention: users bucketed by first-active week,
    * distinct actives per (cohort_week, active_week). The join back
    * of the per-user cohort frame is keyed on user_id — the same key
    * as the `min` aggregation that produced it, so the exchange is
    * reused — and the distinct-count is the standard two-level
    * aggregation (no Expand: it is the only aggregate). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    // one division, then floor: |double error| ≪ the ≥1 µs gap to any
    // week boundary, so the truncation matches DuckDB's integer `//`
    val weeks = Tables(spark, dir, "events")
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(604800000000L))
          .cast("long").as("week"))
    val cohort = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort, "user_id")
      .groupBy(col("cohort_week"), col("week").as("active_week"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Time-series gap fill + forward fill: per-user 5-minute buckets
    * densified over the user's own [min, max] span (empty buckets get
    * n=0), with the last seen aggregate carried forward.
    *
    * The fill happens DURING densification: `lead` over the sparse
    * per-user aggregates finds each observed bucket's successor, and
    * `explode(sequence(bucket, next-step))` emits the bucket plus its
    * gap rows already carrying the observed value — so the only
    * window sort and the only shuffle touch the sparse frame, and the
    * dense output (span/step rows per user, the operator's inherent
    * output size) is generated in its final form. The naive shape —
    * generate a dense axis, left-join the sparse aggregates back,
    * `last(ignoreNulls)` over the dense rows — costs a join and a
    * window sort on the DENSE row count; measured 5.8x slower at
    * sf0.1 (6.9 s vs 1.2 s bench, all columns evaluated) and the gap
    * widens with sparsity, which is the 100 TB regime. */
  def gapfillFfill(spark: SparkSession, dir: String): DataFrame = {
    // one explicit user_id exchange serves BOTH the bucket aggregation
    // (HashPartitioning(user_id) satisfies the (user_id, bucket_s)
    // clustering — subset rule) and the lead() window: audited 2
    // exchanges -> 1. The forfeited map-side partial agg is near-free
    // here — (user, bucket) groups are fine-grained, so partial
    // buffers barely shrink the shuffle.
    val agg = Tables(spark, dir, "events")
      .select(col("user_id"),
        (floor(unix_micros(col("ts")) / lit(300000000L)) * lit(300L))
          .cast("long").as("bucket_s"),
        col("value"))
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("bucket_s"))
      .agg(count(lit(1)).as("n_obs"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bucket_s").asc)
    agg
      .withColumn("nxt", lead(col("bucket_s"), 1).over(w))
      .select(col("user_id"), col("n_obs"), col("sum_value"),
        col("bucket_s").as("obs_bucket"),
        explode(sequence(col("bucket_s"),
          coalesce(col("nxt") - lit(300L), col("bucket_s")),
          lit(300L))).as("bucket_s"))
      .select(col("user_id"), col("bucket_s"),
        when(col("bucket_s") === col("obs_bucket"), col("n_obs"))
          .otherwise(lit(0L)).as("n_obs"),
        col("sum_value").as("ffill_value"))
  }

  /** [[gapfillFfill]]'s LINEAR-interpolation sibling — the time-series
    * resample that draws a straight line between consecutive
    * observations instead of holding the last value: filled bucket b
    * between observations (b0,v0) and (b1,v1) gets
    * v0 + (v1−v0)·(b−b0)/(b1−b0). Every term is an IEEE op on exact
    * inputs (bucket deltas are exact longs, v0/v1 exact-decimal sums
    * cast once) evaluated in one fixed expression order, so the
    * doubles hash-gate — the same argument as `grouped_regression`.
    * Identical single-exchange shape as the ffill variant; the last
    * observation has no successor and fills nothing beyond itself. */
  def gapfillLinear(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables(spark, dir, "events")
      .select(col("user_id"),
        (floor(unix_micros(col("ts")) / lit(300000000L)) * lit(300L))
          .cast("long").as("bucket_s"),
        col("value"))
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("bucket_s"))
      .agg(sum(dec(col("value"))).cast("double").as("v0"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bucket_s").asc)
    agg
      .withColumn("b1", lead(col("bucket_s"), 1).over(w))
      .withColumn("v1", lead(col("v0"), 1).over(w))
      .select(col("user_id"), col("v0"), col("v1"),
        col("bucket_s").as("b0"), col("b1"),
        explode(sequence(col("bucket_s"),
          coalesce(col("b1") - lit(300L), col("bucket_s")),
          lit(300L))).as("bucket_s"))
      .select(col("user_id"), col("bucket_s"),
        when(col("bucket_s") === col("b0"), col("v0"))
          .otherwise(col("v0") + (col("v1") - col("v0")) *
            ((col("bucket_s") - col("b0")).cast("double") /
              (col("b1") - col("b0")).cast("double")))
          .as("interp_value"))
  }

  /** Hopping (sliding) event-time windows: 10-minute windows every
    * 5 minutes — each event lands in exactly 2 windows. Spark's
    * `window(ts, size, slide)` replicates rows at the scan (a
    * size/slide fan-out, the irreducible cost of overlapping
    * windows); surfaced as epoch-second starts for the dtype-stable
    * compare. The DuckDB twin is the equivalent union of two
    * shifted tumbling aggregations. */
  def eventsHoppingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(
        unix_timestamp(window(col("ts"), "10 minutes", "5 minutes")
          .getField("start")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))

  /** TPC-H Q9-shaped profit rollup through part & supplier — the two
    * remaining tables of the test schema: lineitem joined to broadcast
    * part (filtered at the scan) and broadcast supplier→nation, profit
    * summed per (nation, brand) in exact decimal. */
  def q9ProfitAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
      .filter(col("p_type").startsWith("STANDARD"))
    val supp = Tables(spark, dir, "supplier")
    val nation = Tables(spark, dir, "nation")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("profit"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q17-shaped correlated scalar subquery: lineitems under half
    * their part's average quantity — exercises Catalyst's subquery
    * decorrelation (rewritten to an aggregate + join, visible in the
    * plan; no per-row re-execution). The average is written as the
    * exact-decimal sum over the count on BOTH engines so the
    * comparison threshold is bit-stable. */
  def q17CorrelatedSubq(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("li_q17")
    Tables(spark, dir, "part").createOrReplaceTempView("part_q17")
    spark.sql(
      """SELECT p_brand, count(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_revenue
        |FROM li_q17 JOIN part_q17 ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |  AND l_quantity < (
        |    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |      AS DOUBLE) / COUNT(*))
        |    FROM li_q17 l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand""".stripMargin)
  }

  /** Time-weighted average over an irregular series (the TSDB
    * `time_weight('LOCF')` shape): each observation holds until the
    * next one, so its weight is the gap to the successor in
    * MICROSECONDS — exact integers — and the weighted sum is
    * DECIMAL(18,2) × BIGINT, exact until the single closing double
    * divide. The per-type last event has no successor and carries
    * zero weight (dropped on both engines). One window pass (lead on
    * the (ts, event_id) total order — per-partition state is one
    * row) + one map-side-combined aggregate; at 100 TB the window
    * partitions by event_type exactly as here. */
  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    // all-integer weighted sum: value in cent units (exact small
    // BIGINT) x microsecond gaps — a DECIMAL(38,2) sum cast to double
    // is NOT cross-engine bit-stable at 17 significant digits (DuckDB
    // converts int128/10^s with two roundings), BIGINT -> double is
    val vUnits = (dec(col("value")) * 100).cast("long")
    Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("ts"),
        vUnits.as("v_units"))
      .withColumn("dur_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(col("v_units") * col("dur_us")).as("wsum_units"),
        sum(col("dur_us")).as("total_us"))
      .select(col("event_type"), col("total_us"),
        (col("wsum_units").cast("double") /
          (col("total_us").cast("double") * lit(100.0))).as("tw_avg"))
  }

  /** Exact ROC AUC via the Mann-Whitney rank-sum — "does `value`
    * separate clicks from the rest", the standard scorer/classifier
    * eval. All-integer until one closing divide: ties get average
    * ranks, kept integral by working in DOUBLED rank units (a tie
    * group at cumulative offset `cum` with `c` members has
    * 2·avgrank = 2·cum + c + 1), so AUC = (2·R1 − n1(n1+1)) /
    * (2·n1·n0) is a single IEEE division of exact BIGINTs.
    *
    * Scale shape: ranks are NOT a global row window — scores
    * pre-aggregate to (score, count, pos_count) first (map-side
    * combined), and the one ordered window runs over the collapsed
    * distinct-score frame (the [[skylinePareto]] trick; |distinct
    * scores| ≪ rows). */
  def aucRankSum(spark: SparkSession, dir: String): DataFrame = {
    val perScore = Tables(spark, dir, "events")
      .select(col("value").as("s"),
        (col("event_type") === "click").cast("long").as("pos"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("pos")).as("cp"))
    val w = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .agg(sum(col("cp") * (lit(2) * col("cum") + col("c") + lit(1)))
          .as("r1x2"),
        sum(col("cp")).as("n1"), sum(col("c") - col("cp")).as("n0"))
      .select(col("n1"), col("n0"),
        ((col("r1x2") - col("n1") * (col("n1") + lit(1L))).cast("double") /
          (lit(2.0) * (col("n1") * col("n0")).cast("double"))).as("auc"))
  }

  /** Linear (equal-split) multi-touch attribution — every event
    * strictly before a user's FIRST purchase shares the conversion
    * credit equally. Credit stays an exact integer FRACTION
    * (num/den) per (user, channel) instead of a summed float —
    * 1/n + 1/m double sums are order-dependent and could never
    * hash-gate; the fraction rows are also what a warehouse needs to
    * re-weight credit later. "Strictly before" is the (us, event_id)
    * struct total order, so a touch tied to the purchase microsecond
    * resolves identically on both engines. Two aggregates + one
    * join, all co-partitioned on user_id. */
  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("us"), col("event_id"))).as("fp"))
      .select(col("user_id"), col("fp.us").as("p_us"),
        col("fp.event_id").as("p_id"))
    val touches = ev.join(firstP, "user_id")
      .filter(struct(col("us"), col("event_id")) <
        struct(col("p_us"), col("p_id")))
    val den = touches.groupBy(col("user_id")).agg(count(lit(1)).as("den"))
    touches.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("num"))
      .join(den, "user_id")
      .select(col("user_id"), col("event_type").as("channel"),
        col("num"), col("den"))
  }

  /** Time-DECAY attribution — completes the attribution family
    * (first-touch, linear, decay): touches closer to the conversion
    * earn exponentially more credit, with half-life = 1 day. Exact by
    * construction: weight = 2^(40−days_before) as a BIGINT (zero past
    * 40 days; shift amounts bounded 0..40 on BOTH engines — never
    * trust `>>` with a data-driven amount ≥ 64, Java wraps shift
    * counts mod 64), per-channel and per-user sums stay integral, and
    * the credit share is ONE closing divide of exact BIGINTs. Same
    * two-aggregate shape as [[linearAttribution]]. */
  def decayAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("us"), col("event_id"))).as("fp"))
      .select(col("user_id"), col("fp.us").as("p_us"),
        col("fp.event_id").as("p_id"))
    val touches = ev.join(firstP, "user_id")
      .filter(struct(col("us"), col("event_id")) <
        struct(col("p_us"), col("p_id")))
      .withColumn("days", expr("(p_us - us) div 86400000000"))
      .withColumn("w",
        when(col("days") > 40, lit(0L))
          .otherwise(expr("shiftleft(1L, cast(40 - days as int))")))
    val den = touches.groupBy(col("user_id"))
      .agg(sum(col("w")).as("den"))
    touches.groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("w")).as("w_sum"))
      .join(den, "user_id")
      .filter(col("den") > 0)
      .select(col("user_id"), col("event_type").as("channel"),
        col("w_sum"), col("den"),
        (col("w_sum").cast("double") / col("den").cast("double"))
          .as("share"))
  }

  /** Session concurrency via SWEEP LINE — "how many sessions are open
    * at once" (capacity planning's base curve), the interval-overlap
    * counting pattern: each session (from [[sessionize]]'s
    * gaps-and-islands algebra) emits (+1 at start, −1 just after
    * last event), and a running sum over the time-ordered deltas IS
    * the concurrency at every change point. Ties collapse by
    * pre-aggregating deltas per instant, so the curve is unique and
    * the global running sum deterministic. The window is global over
    * CHANGE POINTS (two per session, not per event) — at 100 TB the
    * same sweep partitions by day/tenant with per-partition offsets
    * re-based by one scalar pass, the standard distributed sweep-line
    * story. Output: change points where concurrency moves, with the
    * concurrency AFTER the point. */
  def sessionConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc)
    val sessions = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w) >= 600000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
    val deltas = sessions
      .select(col("s_us").as("t"), lit(1L).as("d"))
      .unionByName(sessions
        .select((col("e_us") + 1L).as("t"), lit(-1L).as("d")))
      .groupBy(col("t")).agg(sum(col("d")).as("delta"))
      .filter(col("delta") =!= 0)
    val sweep = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("concurrency", sum(col("delta")).over(sweep))
      .select(col("t"), col("delta"), col("concurrency"))
  }

  /** RFM scoring — the classic customer-value segmentation (recency /
    * frequency / monetary quintiles), built WITHOUT `ntile`: bucket =
    * (5·(rank−1)) div n with rank from a fully-tie-broken order, so
    * the quintile edges are pure integer arithmetic and cannot drift
    * between engines' ntile remainder conventions. Monetary is exact
    * cents (floor(value·100)); recency ranks NEWEST first so score 1
    * = most recent, matching the marketing convention on all three
    * axes (1 = best quintile... inverted: here 0 = best to keep the
    * algebra pure div — documented in the column names). One
    * user-level aggregate + three rank windows over the 1500-row
    * user frame. */
  def rfmScores(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        sum(floor(col("value") * lit(100.0)).cast("long")).as("cents"))
    val n = count(lit(1)).over(Window.partitionBy())
    def quintile(order: Seq[Column]): Column =
      ((lit(5) * (row_number().over(Window.orderBy(order: _*)) - 1))
        .cast("long") / n).cast("long")
    base.select(col("user_id"), col("last_us"), col("freq"),
        col("cents"),
        quintile(Seq(col("last_us").desc, col("user_id").asc))
          .as("r_bucket"),
        quintile(Seq(col("freq").desc, col("user_id").asc))
          .as("f_bucket"),
        quintile(Seq(col("cents").desc, col("user_id").asc))
          .as("m_bucket"))
  }

  /** ABC / Pareto classification of parts by lineitem revenue: rank
    * parts by exact revenue cents, then class A = the head covering
    * 80% of cumulative revenue, B = next 15%, C = tail — with every
    * threshold test CROSS-MULTIPLIED (`cum·100 ≤ 80·total`) so the
    * classification never touches a float. The [[skylinePareto]]
    * cousin in name only — this is the cumulative-share workhorse of
    * inventory/spend analysis. One aggregate + one ordered running
    * sum over the part-level frame. */
  def paretoAbc(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long"))
        .as("cents"))
    val w = Window.orderBy(col("cents").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = sum(col("cents")).over(Window.partitionBy())
    rev.withColumn("cum", sum(col("cents")).over(w))
      .withColumn("total", total)
      .select(col("l_partkey"), col("cents"), col("cum"),
        when(col("cum") * 100 <= col("total") * 80, "A")
          .when(col("cum") * 100 <= col("total") * 95, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Spark's native `session_window` twin-gated against the first-
    * principles gaps-and-islands algebra ([[sessionize]]): the oracle
    * computes sessions as break-on-gap≥10min islands, and the builtin
    * must land on identical (start, end = last + gap, count) rows —
    * pinning that the engine's session-merge semantics match the
    * textbook definition. The builtin's plan is the one a 100 TB run
    * wants: one user_id exchange, sessions merged inside the
    * aggregate, no window sort followed by a second aggregate. */
  def sessionWindowBuiltin(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), "10 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))

  /** Dyadic EWMA over gap-filled daily counts — smoothing with
    * α = 1/2 makes every weight a power of two, so the 8-term
    * weighted sum is EXACT integer arithmetic (scaled by 2⁷;
    * `ewma = scaled/255` is the one IEEE divide) — the reason this
    * hash-gates where a float EWMA recursion never could. Days with
    * no events count 0 via the per-type dense calendar (the
    * [[gapfillFfill]] explode shape); days before a type's first
    * observation contribute 0 on both engines (lag default). One
    * aggregate + one per-type ordered window. */
  def ewmaDyadic(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val dense = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    val scaled = (0 to 7).map(k =>
        lit(1L << (7 - k)) * lag(col("c"), k, 0L).over(w))
      .reduce(_ + _)
    dense.join(daily, Seq("event_type", "day"), "left_outer")
      .select(col("event_type"), col("day"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("ewma_scaled", scaled)
      .select(col("event_type"), col("day"), col("ewma_scaled"),
        (col("ewma_scaled").cast("double") / lit(255.0)).as("ewma"))
  }

  /** Audience overlap matrix: for every pair of event types, how many
    * users both cohorts share, each cohort's size, and the Jaccard —
    * the "segment overlap" readout behind audience planning and
    * cannibalization checks. Shape: one distinct (type, user)
    * projection, then a self-join keyed on user_id — per-user fanout
    * is C(types-per-user, 2), bounded by the (small) type universe,
    * so the join output is O(users · k²), never O(users²); sizes
    * broadcast back onto the 10-row pair frame. The Jaccard is one
    * IEEE divide of exact BIGINTs. */
  def cohortOverlap(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.materialize(Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct())
    val sz = d.groupBy(col("event_type")).agg(count(lit(1)).as("sz"))
    d.as("a").join(d.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sz.select(col("event_type").as("type_a"),
        col("sz").as("n_a"))), "type_a")
      .join(broadcast(sz.select(col("event_type").as("type_b"),
        col("sz").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
  }

  /** Exact weighted (lower) median: per return flag, the smallest
    * l_extendedprice whose running quantity-weight reaches half the
    * group's total weight — the robust center a mean can't give when
    * line sizes skew. Weights are integral (l_quantity carries whole
    * units; cast asserts nothing is lost), the threshold test is the
    * cross-multiplied `2·cumw ≥ totw` (no halving, no floats), and
    * the selection is deterministic via the (price, orderkey,
    * linenumber) total order. One partition sort serves both windows
    * (running sum + pick-first). At 100 TB: medians-of-groups is a
    * per-key sort within the group's partition — for a GLOBAL
    * weighted median swap in the two-pass quantile-sketch bound +
    * exact-scan-within-bound pattern (`quantiles_approx_bounds`). */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val order = Seq(col("l_extendedprice").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val wRun = Window.partitionBy(col("l_returnflag"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    li.withColumn("cumw", sum(col("w")).over(wRun))
      .withColumn("totw", sum(col("w")).over(wAll))
      .filter(col("cumw") * 2 >= col("totw"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(order: _*)))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("totw").as("total_weight"),
        col("l_extendedprice").as("weighted_median"))
  }

  /** Sequence pattern matching (MATCH_RECOGNIZE's workhorse subset):
    * each user's chronological event initials pack into one string
    * (`v`iew `c`lick `p`urchase `s`ignup `e`rror — the same
    * sort_array(collect_list) shape as [[userEventPaths]], one
    * shuffle, no window sort), and `vc*p` — a view, any clicks, then
    * a purchase — is counted as non-overlapping greedy regex matches
    * over that string. Works because a row-per-event pattern join
    * can't express "any number of" steps, while a per-user packed
    * sequence makes it ONE codegen'd regexp per user. Pattern stays
    * Java/RE2-portable (literal initials + `*`), so both engines
    * find identical matches; `match_chars` sums matched-span lengths
    * over the bounded match list. */
  def eventPatternMatch(spark: SparkSession, dir: String): DataFrame = {
    val seqStr = concat_ws("",
      transform(
        sort_array(collect_list(struct(col("us"), col("event_id"),
          col("ini")))),
        s => s.getField("ini")))
    Tables(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("ini"))
      .groupBy(col("user_id"))
      .agg(seqStr.as("seq"))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        size(regexp_extract_all(col("seq"), lit("vc*p"), lit(0)))
          .cast("long").as("n_matches"),
        aggregate(
          transform(regexp_extract_all(col("seq"), lit("vc*p"), lit(0)),
            m => length(m).cast("long")),
          lit(0L), (a, b) => a + b).as("match_chars"))
  }

  /** The multi-pattern patterns shared by gate and oracle: all
    * Java/RE2-portable (literal initials, classes, `*`/`+`). */
  private[queries] val MultiPatterns = Seq("vc*p", "v+c", "cp")

  /** MULTI-step MATCH_RECOGNIZE: several patterns per user, each with
    * PER-MATCH MEASURES — the piece [[eventPatternMatch]]'s single
    * count couldn't express. The key identity: a greedy
    * non-overlapping scan factors the sequence as
    * `gap₀ m₁ gap₁ m₂ … gapₙ`, and BOTH engines expose the two
    * halves (`regexp_extract_all` = the mᵢ, regex `split` = the
    * gapᵢ), so every match's START POSITION is a prefix-sum of gap
    * and match lengths — no positional regex API needed. Positions
    * index into the user's packed, chronologically-sorted timestamp
    * array, making the per-match TIME SPAN (last event − first
    * event, integer micros) exact on both engines. Output: one row
    * per (user, pattern) with ≥1 match — match count, matched chars,
    * summed span.
    *
    * Scale: one shuffle packs each user once (same shape as
    * [[eventPatternMatch]]); the three patterns then scan the
    * materialized packed frame with per-row expressions only. The
    * prefix sums are O(matches²) per user in interpreted HOFs —
    * bounded by the match count, not the event count. */
  def eventMultiPattern(spark: SparkSession, dir: String): DataFrame = {
    val sorted = sort_array(collect_list(struct(col("us"),
      col("event_id"), col("ini"))))
    val packed = graft.Tables.materialize(
      Tables(spark, dir, "events")
        .filter(col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), substring(col("event_type"), 1, 1).as("ini"))
        .groupBy(col("user_id"))
        .agg(
          concat_ws("",
            transform(sorted, s => s.getField("ini"))).as("seq"),
          transform(sorted, s => s.getField("us")).as("usarr")))
    MultiPatterns.map { p =>
      def prefLen(arr: Column, n: Column): Column =
        aggregate(slice(arr, lit(1), n), lit(0L),
          (a, x) => a + length(x))
      packed
        .select(col("user_id"), col("usarr"),
          regexp_extract_all(col("seq"), lit(p), lit(0)).as("ms"),
          split(col("seq"), p, -1).as("gaps"))
        .filter(size(col("ms")) > 0)
        .withColumn("starts",
          transform(sequence(lit(1), size(col("ms"))), i =>
            prefLen(col("gaps"), i) + prefLen(col("ms"), i - 1) +
              lit(1L)))
        .withColumn("spans", zip_with(col("starts"), col("ms"),
          (s, m) =>
            element_at(col("usarr"), (s + length(m) - 1).cast("int")) -
              element_at(col("usarr"), s.cast("int"))))
        .select(col("user_id"), lit(p).as("pattern"),
          size(col("ms")).cast("long").as("n_matches"),
          aggregate(transform(col("ms"), m => length(m).cast("long")),
            lit(0L), (a, b) => a + b).as("match_chars"),
          aggregate(col("spans"), lit(0L), (a, b) => a + b)
            .as("span_us"))
    }.reduce(_.unionByName(_))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_multi_pattern" -> eventMultiPattern _,
    "cohort_overlap" -> cohortOverlap _,
    "weighted_median" -> weightedMedian _,
    "event_pattern_match" -> eventPatternMatch _,
    "session_window_builtin" -> sessionWindowBuiltin _,
    "ewma_dyadic" -> ewmaDyadic _,
    "auc_rank_sum" -> aucRankSum _,
    "linear_attribution" -> linearAttribution _,
    "time_weighted_avg" -> timeWeightedAvg _,
    "sessionize" -> sessionize _,
    "user_event_paths" -> userEventPaths _,
    "cms_point_estimates" -> cmsPointEstimates _,
    "cms_join_size" -> cmsJoinSize _,
    "hll_distinct_estimates" -> hllDistinctEstimates _,
    "hll_agg_native" -> hllAggNative _,
    "ratio_to_report" -> ratioToReport _,
    "grouped_regression" -> groupedRegression _,
    "corr_matrix" -> hourlyCorrMatrix _,
    "ab_test_zscore" -> abTestZscore _,
    "chisq_drift" -> chisqDrift _,
    "bootstrap_ci" -> bootstrapCi _,
    "assoc_rules" -> assocRules _,
    "conversion_lag_hist" -> conversionLagHist _,
    "funnel_windowed" -> funnelWindowed _,
    "first_touch_attribution" -> firstTouchAttribution _,
    "journey_trigrams" -> journeyTrigrams _,
    "cusum_changepoint" -> cusumChangepoint _,
    "seasonal_decompose" -> seasonalDecompose _,
    "forecast_backtest" -> forecastBacktest _,
    "activity_heatmap" -> activityHeatmap _,
    "growth_accounting" -> growthAccounting _,
    "cohort_ltv" -> cohortLtv _,
    "q13_custdist" -> q13CustDist _,
    "q22_prospects" -> q22Prospects _,
    "interval_merge" -> intervalMerge _,
    "mode_per_group" -> modePerGroup _,
    "freq_items_bounds" -> freqItemsBounds _,
    "event_transitions" -> eventTransitions _,
    "window_count_distinct" -> windowCountDistinct _,
    "mad_outliers" -> madOutliers _,
    "q9_profit_agg" -> q9ProfitAgg _,
    "q17_correlated_subq" -> q17CorrelatedSubq _,
    "scd2_history" -> scd2History _,
    "cohort_retention" -> cohortRetention _,
    "gapfill_ffill" -> gapfillFfill _,
    "decay_attribution" -> decayAttribution _,
    "rfm_scores" -> rfmScores _,
    "session_concurrency" -> sessionConcurrency _,
    "pareto_abc" -> paretoAbc _,
    "gapfill_linear" -> gapfillLinear _,
    "events_hopping_agg" -> eventsHoppingAgg _,
    "q1_agg" -> q1Agg _,
    "q3_join_topk" -> q3JoinTopk _,
    "q5_multijoin" -> q5MultiJoin _,
    "window_rank" -> windowRank _,
    "events_window_agg" -> eventsWindowAgg _,
    "semi_anti_join" -> semiAntiJoin _,
    "bloom_semi_join" -> bloomSemiJoin _,
    "funnel_steps" -> funnelSteps _,
    "rollup_agg" -> rollupAgg _,
    "salted_join" -> saltedJoinAgg _,
    "quantiles_agg" -> quantilesAgg _,
    "quantiles_approx_bounds" -> quantilesApproxBounds _)

  /** DuckDB twin of [[eventMultiPattern]]: per pattern, the same
    * gap/match factoring (`string_split_regex` + `regexp_extract_all`)
    * and prefix-sum position algebra, UNION ALL across the shared
    * pattern list. */
  private lazy val eventMultiPatternSql = {
    def pref(arr: String) =
      s"COALESCE(list_sum(list_transform($arr, q -> length(q))), 0)"
    val perPattern = MultiPatterns.map { p =>
      s"""SELECT user_id, '$p' AS pattern,
         |  CAST(len(ms) AS BIGINT) AS n_matches,
         |  CAST(${pref("ms")} AS BIGINT) AS match_chars,
         |  CAST(COALESCE(list_sum(list_transform(range(1, len(ms) + 1),
         |    i ->
         |      usarr[CAST(${pref("gaps[1:CAST(i AS INT)]")}
         |         + ${pref("ms[1:CAST(i AS INT) - 1]")}
         |         + length(ms[CAST(i AS INT)]) AS INT)]
         |    - usarr[CAST(${pref("gaps[1:CAST(i AS INT)]")}
         |         + ${pref("ms[1:CAST(i AS INT) - 1]")} + 1 AS INT)])),
         |    0) AS BIGINT) AS span_us
         |FROM (
         |  SELECT user_id, usarr,
         |    regexp_extract_all(seq, '$p') AS ms,
         |    string_split_regex(seq, '$p') AS gaps
         |  FROM mp_s) x
         |WHERE len(ms) > 0""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH mp_s AS (
       |  SELECT user_id,
       |    string_agg(ini, '' ORDER BY us, event_id) AS seq,
       |    list(us ORDER BY us, event_id) AS usarr
       |  FROM (
       |    SELECT user_id, epoch_us(ts) AS us, event_id,
       |      substr(event_type, 1, 1) AS ini
       |    FROM events WHERE ts IS NOT NULL) e
       |  GROUP BY user_id)
       |$perPattern""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "event_multi_pattern" -> eventMultiPatternSql,
    "event_pattern_match" ->
      """WITH pm_s AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM events WHERE ts IS NOT NULL
        |  GROUP BY user_id),
        |pm_m AS (
        |  SELECT user_id, seq,
        |    regexp_extract_all(seq, 'vc*p') AS ms
        |  FROM pm_s)
        |SELECT user_id,
        |  CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST(length(ms) AS BIGINT) AS n_matches,
        |  CAST(COALESCE(list_sum(list_transform(ms,
        |    m -> length(m))), 0) AS BIGINT) AS match_chars
        |FROM pm_m""".stripMargin,
    "cohort_overlap" ->
      """WITH co_d AS (
        |  SELECT DISTINCT event_type, user_id FROM events),
        |co_sz AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS sz
        |  FROM co_d GROUP BY 1),
        |co_i AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM co_d a JOIN co_d b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT i.type_a, i.type_b, sa.sz AS n_a, sb.sz AS n_b,
        |  i.n_common,
        |  CAST(i.n_common AS DOUBLE) /
        |    CAST(sa.sz + sb.sz - i.n_common AS DOUBLE) AS jaccard
        |FROM co_i i
        |JOIN co_sz sa ON sa.event_type = i.type_a
        |JOIN co_sz sb ON sb.event_type = i.type_b""".stripMargin,
    "weighted_median" ->
      """WITH wm AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    CAST(l_quantity AS BIGINT) AS w,
        |    sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag) AS totw,
        |    row_number() OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS seq
        |  FROM lineitem),
        |wq AS (
        |  SELECT l_returnflag, totw, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY seq)
        |      AS rk
        |  FROM wm WHERE cumw * 2 >= totw)
        |SELECT l_returnflag, CAST(totw AS BIGINT) AS total_weight,
        |  l_extendedprice AS weighted_median
        |FROM wq WHERE rk = 1""".stripMargin,
    // the builtin must equal break-on-gap>=10min islands with
    // end = last event + gap
    "session_window_builtin" ->
      """WITH swb_e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events),
        |swb_b AS (
        |  SELECT user_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us) >= 600000000 THEN 1 ELSE 0 END AS brk
        |  FROM swb_e),
        |swb_s AS (
        |  SELECT user_id, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM swb_b)
        |SELECT user_id,
        |  MIN(us) AS session_start_us,
        |  MAX(us) + 600000000 AS session_end_us,
        |  COUNT(*) AS n_events
        |FROM swb_s GROUP BY user_id, sid""".stripMargin,
    // 8 power-of-two weights: exact integers until the one divide
    "ewma_dyadic" ->
      """WITH ew_d AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |ew_s AS (SELECT event_type, min(day) AS lo, max(day) AS hi
        |         FROM ew_d GROUP BY 1),
        |ew_f AS (SELECT event_type, unnest(generate_series(lo, hi))
        |           AS day
        |         FROM ew_s),
        |ew_j AS (
        |  SELECT f.event_type, f.day, COALESCE(d.c, 0) AS c
        |  FROM ew_f f LEFT JOIN ew_d d
        |    ON d.event_type = f.event_type AND d.day = f.day),
        |ew_l AS (
        |  SELECT event_type, day,
        |    128 * c + 64 * lag(c, 1, 0) OVER w + 32 * lag(c, 2, 0) OVER w
        |    + 16 * lag(c, 3, 0) OVER w + 8 * lag(c, 4, 0) OVER w
        |    + 4 * lag(c, 5, 0) OVER w + 2 * lag(c, 6, 0) OVER w
        |    + lag(c, 7, 0) OVER w AS ewma_scaled
        |  FROM ew_j
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day,
        |  CAST(ewma_scaled AS BIGINT) AS ewma_scaled,
        |  CAST(ewma_scaled AS DOUBLE) / CAST(255 AS DOUBLE) AS ewma
        |FROM ew_l""".stripMargin,
    // doubled-rank-unit Mann-Whitney: all sums BIGINT, one IEEE divide
    "auc_rank_sum" ->
      """WITH auc_ps AS (
        |  SELECT value AS s, COUNT(*) AS c,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cp
        |  FROM events GROUP BY 1),
        |auc_r AS (
        |  SELECT s, c, cp,
        |    COALESCE(SUM(c) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum
        |  FROM auc_ps),
        |auc_t AS (
        |  SELECT CAST(SUM(cp * (2 * cum + c + 1)) AS BIGINT) AS r1x2,
        |    CAST(SUM(cp) AS BIGINT) AS n1,
        |    CAST(SUM(c - cp) AS BIGINT) AS n0
        |  FROM auc_r)
        |SELECT n1, n0,
        |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) /
        |    (CAST(2 AS DOUBLE) * CAST(n1 * n0 AS DOUBLE)) AS auc
        |FROM auc_t""".stripMargin,
    // credit as exact integer fractions; strictly-before on the
    // (us, event_id) row order
    "linear_attribution" ->
      """WITH la_ev AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        |  FROM events),
        |la_fp AS (
        |  SELECT user_id, MIN(ROW(us, event_id)) AS fp
        |  FROM la_ev WHERE event_type = 'purchase' GROUP BY 1),
        |la_t AS (
        |  SELECT e.user_id, e.event_type
        |  FROM la_ev e JOIN la_fp f ON e.user_id = f.user_id
        |  WHERE ROW(e.us, e.event_id) < f.fp),
        |la_d AS (SELECT user_id, COUNT(*) AS den FROM la_t GROUP BY 1)
        |SELECT t.user_id, t.event_type AS channel,
        |  COUNT(*) AS num, MIN(d.den) AS den
        |FROM la_t t JOIN la_d d ON t.user_id = d.user_id
        |GROUP BY 1, 2""".stripMargin,
    // weights are exact integer microsecond gaps; weighted sum exact
    // DECIMAL x BIGINT; one closing IEEE divide
    "time_weighted_avg" ->
      """WITH twa AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v_units,
        |    epoch_us(lead(ts) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id)) - epoch_us(ts) AS dur_us
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(dur_us) AS BIGINT) AS total_us,
        |  CAST(CAST(SUM(v_units * dur_us) AS BIGINT) AS DOUBLE) /
        |    (CAST(CAST(SUM(dur_us) AS BIGINT) AS DOUBLE) *
        |     CAST(100 AS DOUBLE)) AS tw_avg
        |FROM twa WHERE dur_us IS NOT NULL
        |GROUP BY 1""".stripMargin,
    // constant-true `captured`: any loss of the sketch's one-sided
    // guarantee flips a boolean and hash-fails the gate
    "freq_items_bounds" ->
      """WITH c AS (
        |  SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c)
        |SELECT event_type, cnt,
        |  (cnt > total * 0.1) AS is_heavy,
        |  TRUE AS captured
        |FROM c, t""".stripMargin,
    "mode_per_group" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, event_type, n,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, event_type ASC) AS rk
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, n AS mode_n
        |FROM r WHERE rk = 1""".stripMargin,
    "event_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events)
        |SELECT prev, event_type AS curr, count(*) AS n
        |FROM o WHERE prev IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 120000000 AS e FROM events),
        |m AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN s > max(e) OVER (PARTITION BY user_id
        |        ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM iv),
        |g AS (
        |  SELECT user_id, s, e,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM m)
        |SELECT user_id, island, min(s) AS start_us, max(e) AS end_us,
        |  count(*) AS n_iv
        |FROM g GROUP BY 1, 2""".stripMargin,
    "window_count_distinct" ->
      """SELECT user_id, event_id, epoch_us(ts) AS us,
        |  count(DISTINCT event_type) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS UNBOUNDED PRECEDING) AS n_types_seen
        |FROM events""".stripMargin,
    "mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type,
        |    quantile_cont(abs(e.value - med.med), 0.5) AS mad
        |  FROM events e JOIN med USING (event_type) GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN abs(e.value - med.med) > 3 * dev.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(med.med) AS med, max(dev.mad) AS mad
        |FROM events e JOIN med USING (event_type)
        |  JOIN dev USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q9_profit_agg" ->
      """SELECT n_name, p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS profit,
        |  COUNT(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_type LIKE 'STANDARD%'
        |GROUP BY n_name, p_brand""".stripMargin,
    "q17_correlated_subq" ->
      """SELECT p_brand, count(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |  AND l_quantity < (
        |    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |      AS DOUBLE) / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand""".stripMargin,
    "session_concurrency" ->
      """WITH sc_e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events),
        |sc_b AS (
        |  SELECT user_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us) >= 600000000 THEN 1 ELSE 0 END AS brk
        |  FROM sc_e),
        |sc_s AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM sc_b),
        |sc_i AS (
        |  SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
        |  FROM sc_s GROUP BY 1, 2),
        |sc_d AS (
        |  SELECT t, CAST(SUM(d) AS BIGINT) AS delta FROM (
        |    SELECT s_us AS t, 1 AS d FROM sc_i
        |    UNION ALL
        |    SELECT e_us + 1, -1 FROM sc_i)
        |  GROUP BY t HAVING SUM(d) <> 0)
        |SELECT t, delta,
        |  CAST(sum(delta) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS concurrency
        |FROM sc_d""".stripMargin,
    "rfm_scores" ->
      """WITH rf AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id),
        |rr AS (
        |  SELECT user_id, last_us, freq, cents,
        |    row_number() OVER (ORDER BY last_us DESC, user_id) AS r_rk,
        |    row_number() OVER (ORDER BY freq DESC, user_id) AS f_rk,
        |    row_number() OVER (ORDER BY cents DESC, user_id) AS m_rk,
        |    count(*) OVER () AS n
        |  FROM rf)
        |SELECT user_id, last_us, freq, cents,
        |  CAST((5 * (r_rk - 1)) // n AS BIGINT) AS r_bucket,
        |  CAST((5 * (f_rk - 1)) // n AS BIGINT) AS f_bucket,
        |  CAST((5 * (m_rk - 1)) // n AS BIGINT) AS m_bucket
        |FROM rr""".stripMargin,
    "pareto_abc" ->
      """WITH pa AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey),
        |pc AS (
        |  SELECT l_partkey, cents,
        |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cents) OVER () AS total
        |  FROM pa)
        |SELECT l_partkey, cents, CAST(cum AS BIGINT) AS cum,
        |  CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |       WHEN cum * 100 <= total * 95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM pc""".stripMargin,
    "decay_attribution" ->
      """WITH de AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        |  FROM events),
        |dp AS (
        |  SELECT user_id, MIN(ROW(us, event_id)) AS fp
        |  FROM de WHERE event_type = 'purchase' GROUP BY user_id),
        |dt AS (
        |  SELECT e.user_id, e.event_type,
        |    (f.fp[1] - e.us) // 86400000000 AS days
        |  FROM de e JOIN dp f ON e.user_id = f.user_id
        |  WHERE ROW(e.us, e.event_id) < f.fp),
        |dw AS (
        |  SELECT user_id, event_type,
        |    CASE WHEN days > 40 THEN CAST(0 AS BIGINT)
        |         ELSE (CAST(1 AS BIGINT) << CAST(40 - days AS INT)) END
        |      AS w
        |  FROM dt),
        |dden AS (
        |  SELECT user_id, CAST(SUM(w) AS BIGINT) AS den
        |  FROM dw GROUP BY user_id)
        |SELECT n.user_id, n.event_type AS channel,
        |  CAST(n.w_sum AS BIGINT) AS w_sum, d.den,
        |  CAST(n.w_sum AS DOUBLE) / CAST(d.den AS DOUBLE) AS share
        |FROM (SELECT user_id, event_type, SUM(w) AS w_sum
        |      FROM dw GROUP BY 1, 2) n
        |JOIN dden d ON d.user_id = n.user_id
        |WHERE d.den > 0""".stripMargin,
    "gapfill_linear" ->
      """WITH ga AS (
        |  SELECT user_id, (epoch_us(ts) // 300000000) * 300 AS bucket_s,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v0
        |  FROM events GROUP BY 1, 2),
        |gl AS (
        |  SELECT user_id, bucket_s AS b0, v0,
        |    lead(bucket_s) OVER (PARTITION BY user_id ORDER BY bucket_s)
        |      AS b1,
        |    lead(v0) OVER (PARTITION BY user_id ORDER BY bucket_s) AS v1
        |  FROM ga),
        |gf AS (
        |  SELECT user_id, b0, b1, v0, v1,
        |    unnest(generate_series(b0, coalesce(b1 - 300, b0), 300))
        |      AS bucket_s
        |  FROM gl)
        |SELECT user_id, bucket_s,
        |  CASE WHEN bucket_s = b0 THEN v0
        |       ELSE v0 + (v1 - v0) *
        |         (CAST(bucket_s - b0 AS DOUBLE) /
        |          CAST(b1 - b0 AS DOUBLE))
        |  END AS interp_value
        |FROM gf""".stripMargin,
    "gapfill_ffill" ->
      """WITH a AS (
        |  SELECT user_id, (epoch_us(ts) // 300000000) * 300 AS bucket_s,
        |    count(*) AS n_obs,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT user_id, min(bucket_s) AS lo, max(bucket_s) AS hi
        |  FROM a GROUP BY user_id),
        |f AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, 300)) AS bucket_s
        |  FROM s)
        |SELECT f.user_id, f.bucket_s,
        |  coalesce(a.n_obs, 0) AS n_obs,
        |  last_value(a.sv IGNORE NULLS) OVER (
        |    PARTITION BY f.user_id ORDER BY f.bucket_s
        |    ROWS UNBOUNDED PRECEDING) AS ffill_value
        |FROM f LEFT JOIN a
        |  ON a.user_id = f.user_id AND a.bucket_s = f.bucket_s""".stripMargin,
    "events_hopping_agg" ->
      """WITH t AS (
        |  SELECT (epoch_us(ts) // 1000000 // 300) * 300 AS b,
        |    event_type, value
        |  FROM events),
        |w AS (
        |  SELECT b AS window_start, event_type, value FROM t
        |  UNION ALL
        |  SELECT b - 300, event_type, value FROM t)
        |SELECT window_start, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |d AS (
        |  SELECT *, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |f AS (
        |  SELECT user_id, us, event_id, event_type FROM d
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS state, us AS valid_from_us,
        |  coalesce(lead(us) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id),
        |    9223372036854775807) AS valid_to_us
        |FROM f""".stripMargin,
    "cohort_retention" ->
      """WITH w AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
        |SELECT c.cohort_week, w.week AS active_week,
        |  count(DISTINCT w.user_id) AS n_active
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |s AS (SELECT user_id, us,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 600000000
        |    THEN 1 ELSE 0 END AS brk FROM e),
        |t AS (SELECT user_id, us,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(us) AS session_start_us, max(us) AS last_event_us
        |FROM t GROUP BY user_id, session_id""".stripMargin,
    "user_event_paths" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  string_agg(event_type, '>'
        |    ORDER BY epoch_us(ts), event_id) AS path
        |FROM events WHERE ts IS NOT NULL GROUP BY user_id""".stripMargin,
    // identical open-book power sums; DuckDB's own regr_slope is NOT
    // used (different internal numerics) — the sums are the contract
    "grouped_regression" ->
      """WITH s AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(20,0))) AS sx,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(20,0))
        |      * CAST(epoch_us(ts) // 86400000000 AS DECIMAL(20,0))) AS sxx,
        |    SUM(CAST(epoch_us(ts) // 86400000000 AS DECIMAL(20,0))
        |      * CAST(value AS DECIMAL(18,2))) AS sxy
        |  FROM events GROUP BY event_type),
        |t AS (
        |  SELECT event_type, n,
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM s)
        |SELECT event_type, n, slope,
        |  (syd - slope * sxd) / CAST(n AS DOUBLE) AS intercept
        |FROM t""".stripMargin,
    // same densified grid + integer power sums; every literal step
    // mirrors the Scala operand order so corr hash-matches bit-exact
    "corr_matrix" ->
      """WITH hr AS (
        |  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
        |    event_type
        |  FROM events),
        |c AS (SELECT h, event_type, count(*) AS c FROM hr GROUP BY 1, 2),
        |grid AS (
        |  SELECT hh.h, tt.event_type,
        |    CAST(COALESCE(c.c, 0) AS DECIMAL(20,0)) AS c
        |  FROM (SELECT DISTINCT h FROM c) hh
        |  CROSS JOIN (SELECT DISTINCT event_type FROM c) tt
        |  LEFT JOIN c ON c.h = hh.h AND c.event_type = tt.event_type),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.c AS x, b.c AS y
        |  FROM grid a JOIN grid b
        |    ON a.h = b.h AND a.event_type < b.event_type),
        |s AS (
        |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
        |    SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM p GROUP BY 1, 2)
        |SELECT type_a, type_b, n,
        |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |  END AS corr
        |FROM s""".stripMargin,
    "ratio_to_report" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_orderpriority) AS DOUBLE)
        |    AS class_total,
        |  o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS share
        |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin,
    // same open-book HLL in SQL: bitlength via bin() string length
    // (never log), 2^-reg as exact dyadic division, double literals
    // CAST explicitly (DuckDB numeric literals are DECIMAL), same
    // left-associative formula text => identical double estimate
    "hll_agg_native" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM events),
        |r AS (
        |  SELECT event_type, h % 64 AS bucket,
        |    CASE WHEN (h >> 6) = 0 THEN 27
        |         ELSE 27 - length(bin(h >> 6)) END AS rnk
        |  FROM h),
        |regs AS (SELECT event_type, bucket, MAX(rnk) AS reg
        |         FROM r GROUP BY 1, 2),
        |est AS (
        |  SELECT event_type,
        |    SUM(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << reg AS DOUBLE))
        |      AS isum,
        |    COUNT(*) AS nz
        |  FROM regs GROUP BY 1),
        |z AS (SELECT event_type, isum + CAST(64 - nz AS DOUBLE) AS zsum
        |      FROM est),
        |exact AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM (SELECT DISTINCT event_type, user_id FROM events)
        |  GROUP BY 1)
        |SELECT z.event_type,
        |  CAST(0.7213 AS DOUBLE)
        |    / (CAST(1.0 AS DOUBLE)
        |       + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE))
        |    * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE) / zsum
        |    AS hll_est,
        |  n_exact
        |FROM z JOIN exact ON z.event_type = exact.event_type""".stripMargin,
    "hll_distinct_estimates" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS h
        |  FROM events),
        |r AS (
        |  SELECT event_type, h % 64 AS bucket,
        |    CASE WHEN (h >> 6) = 0 THEN 27
        |         ELSE 27 - length(bin(h >> 6)) END AS rnk
        |  FROM h),
        |regs AS (SELECT event_type, bucket, MAX(rnk) AS reg
        |         FROM r GROUP BY 1, 2),
        |est AS (
        |  SELECT event_type,
        |    SUM(CAST(1.0 AS DOUBLE) / CAST(1::BIGINT << reg AS DOUBLE))
        |      AS isum,
        |    COUNT(*) AS nz
        |  FROM regs GROUP BY 1),
        |z AS (SELECT event_type, isum + CAST(64 - nz AS DOUBLE) AS zsum,
        |             nz FROM est),
        |exact AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM (SELECT DISTINCT event_type, user_id FROM events)
        |  GROUP BY 1)
        |SELECT z.event_type,
        |  CAST(0.7213 AS DOUBLE)
        |    / (CAST(1.0 AS DOUBLE)
        |       + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE))
        |    * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE) / zsum
        |    AS hll_est,
        |  CAST(nz AS BIGINT) AS buckets_hit, n_exact
        |FROM z JOIN exact ON z.event_type = exact.event_type""".stripMargin,
    // the identical sketch built in SQL: same md5 hash family, same
    // d x w geometry — the full estimate is hash-gated, not a bound
    // 48h windowed chain: pure integer micros bounds
    "funnel_windowed" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS t_view
        |      FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.us) AS t_click
        |  FROM e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.us >= v.t_view
        |    AND e.us <= v.t_view + 172800000000
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.us) AS t_purchase
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= c.t_click
        |    AND e.us <= c.t_click + 172800000000
        |  GROUP BY 1)
        |SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |UNION ALL
        |SELECT 'click', CAST(count(*) AS BIGINT) FROM c
        |UNION ALL
        |SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p""".stripMargin,
    // first touch = row_number over the per-user (us, event_id) total
    // order; revenue folded in exact DECIMAL, one double cast
    "first_touch_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us, value
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_type AS first_touch FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS rk
        |    FROM e) WHERE rk = 1),
        |r AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS np,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS revd
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT f.first_touch, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(SUM(COALESCE(r.np, 0)) AS BIGINT) AS n_purchases,
        |  CAST(SUM(COALESCE(r.revd, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM f LEFT JOIN r ON r.user_id = f.user_id
        |GROUP BY 1""".stripMargin,
    // positive lags: integer // == Spark's pmod-free div here
    "conversion_lag_hist" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |fb AS (
        |  SELECT e.user_id, fv.t_view, min(epoch_us(e.ts)) AS t_buy
        |  FROM events e JOIN fv ON fv.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.t_view
        |  GROUP BY 1, 2)
        |SELECT CAST((t_buy - t_view) // 86400000000 AS BIGINT) AS lag_days,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM fb GROUP BY 1""".stripMargin,
    // distinct-user incidence + pair self-join; each ratio is exactly
    // mirrors bootstrapCi: same hash membership, integer-cent sums,
    // fixed divide per resample mean, percentile_disc CI bounds
    "bootstrap_ci" ->
      """WITH bc_o AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |bc_r AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(SUM(cents) AS BIGINT) AS s_b
        |  FROM bc_o, (SELECT unnest(range(0, 20)) AS b)
        |  WHERE ('0x' || substr(md5(b || '|' || o_orderkey), 1, 8)
        |    )::BIGINT % 2 = 0
        |  GROUP BY b),
        |bc_m AS (
        |  SELECT CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS m_b
        |  FROM bc_r),
        |bc_ci AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_resamples,
        |    percentile_disc(0.05) WITHIN GROUP (ORDER BY m_b)
        |      AS mean_lo,
        |    percentile_disc(0.95) WITHIN GROUP (ORDER BY m_b)
        |      AS mean_hi
        |  FROM bc_m),
        |bc_f AS (
        |  SELECT CAST(SUM(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS mean_full
        |  FROM bc_o)
        |SELECT n_resamples, mean_lo, mean_hi, mean_full
        |FROM bc_ci, bc_f""".stripMargin,
    // mirrors chisqDrift: integer midpoint split, integer cell counts,
    // the e = (row * col) / N and (o-e)^2/e trees in the same operand
    // order, zero-expectation cells pinned to 0 contribution
    "chisq_drift" ->
      """WITH cd_e AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS s FROM events),
        |cd_m AS (
        |  SELECT CAST((min(s) + max(s)) // 2 AS BIGINT) AS mid
        |  FROM cd_e),
        |cd_p AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN s < mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_first,
        |    CAST(SUM(CASE WHEN s >= mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_second
        |  FROM cd_e, cd_m GROUP BY event_type),
        |cd_t AS (
        |  SELECT CAST(SUM(n_first) AS BIGINT) AS t1,
        |    CAST(SUM(n_second) AS BIGINT) AS t2
        |  FROM cd_p)
        |SELECT event_type, n_first, n_second,
        |  CAST(n_first + n_second AS DOUBLE) * CAST(t1 AS DOUBLE)
        |    / CAST(t1 + t2 AS DOUBLE) AS e_first,
        |  (CASE WHEN CAST(n_first + n_second AS DOUBLE)
        |      * CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE) > 0
        |    THEN (CAST(n_first AS DOUBLE)
        |        - CAST(n_first + n_second AS DOUBLE) * CAST(t1 AS DOUBLE)
        |          / CAST(t1 + t2 AS DOUBLE))
        |      * (CAST(n_first AS DOUBLE)
        |        - CAST(n_first + n_second AS DOUBLE) * CAST(t1 AS DOUBLE)
        |          / CAST(t1 + t2 AS DOUBLE))
        |      / (CAST(n_first + n_second AS DOUBLE) * CAST(t1 AS DOUBLE)
        |          / CAST(t1 + t2 AS DOUBLE))
        |    ELSE 0.0 END)
        |  + (CASE WHEN CAST(n_first + n_second AS DOUBLE)
        |      * CAST(t2 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE) > 0
        |    THEN (CAST(n_second AS DOUBLE)
        |        - CAST(n_first + n_second AS DOUBLE) * CAST(t2 AS DOUBLE)
        |          / CAST(t1 + t2 AS DOUBLE))
        |      * (CAST(n_second AS DOUBLE)
        |        - CAST(n_first + n_second AS DOUBLE) * CAST(t2 AS DOUBLE)
        |          / CAST(t1 + t2 AS DOUBLE))
        |      / (CAST(n_first + n_second AS DOUBLE) * CAST(t2 AS DOUBLE)
        |          / CAST(t1 + t2 AS DOUBLE))
        |    ELSE 0.0 END) AS chisq_contrib
        |FROM cd_p, cd_t""".stripMargin,
    // one IEEE divide over exact BIGINT counts, lift mirrors the
    // (n_ab * N) / (n_a * n_b) operand order
    "assoc_rules" ->
      """WITH inc AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        |  FROM inc GROUP BY 1),
        |nu AS (
        |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM inc),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM inc a JOIN inc b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, ta.n_t AS n_a, tb.n_t AS n_b,
        |  p.n_ab, nu.n_users,
        |  CAST(p.n_ab AS DOUBLE) / CAST(nu.n_users AS DOUBLE) AS support,
        |  CAST(p.n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE) AS conf_ab,
        |  CAST(p.n_ab AS DOUBLE) / CAST(tb.n_t AS DOUBLE) AS conf_ba,
        |  CAST(p.n_ab AS DOUBLE) * CAST(nu.n_users AS DOUBLE)
        |    / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)) AS lift
        |FROM p
        |JOIN tot ta ON ta.event_type = p.type_a
        |JOIN tot tb ON tb.event_type = p.type_b, nu""".stripMargin,
    // two LEADs on the (ts, event_id) total order; top-20 cut is a
    // (count desc, trigram asc) total order
    "journey_trigrams" ->
      """WITH o AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin,
    // counts exact BIGINT; the z mirrors the Scala operand dag
    // literally (every literal CAST AS DOUBLE — SKILL.md)
    "ab_test_zscore" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, user_id % 2 AS variant FROM u),
        |cv AS (SELECT DISTINCT user_id FROM events
        |       WHERE event_type = 'purchase'),
        |per AS (
        |  SELECT v.variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM v LEFT JOIN cv ON cv.user_id = v.user_id
        |  GROUP BY v.variant),
        |one AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c_a,
        |    CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c_b
        |  FROM per)
        |SELECT n_a, c_a, n_b, c_b,
        |  CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS cr_a,
        |  CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS cr_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |    / sqrt(CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
        |      * (CAST(1.0 AS DOUBLE)
        |        - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |  END AS z
        |FROM one""".stripMargin,
    "q13_custdist" ->
      """WITH pc AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT COALESCE(pc.n_orders, 0) AS n_orders,
        |  CAST(count(*) AS BIGINT) AS n_custs
        |FROM customer c LEFT JOIN pc ON pc.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    // threshold = exact decimal sum / count, ONE double divide
    "q22_prospects" ->
      """WITH t AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS thr
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_prospects,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_bal
        |FROM customer c, t
        |WHERE c.c_acctbal > t.thr
        |  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
        |                          WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,
    // exact DECIMAL revenue incl. the cumulative window; double once
    "cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value,
        |    CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1),
        |r AS (
        |  SELECT c.cohort_week, e.wk - c.cohort_week AS week_offset,
        |    SUM(CAST(e.value AS DECIMAL(18,2))) AS revd,
        |    CAST(count(*) AS BIGINT) AS n_purchases
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_purchases,
        |  CAST(revd AS DOUBLE) AS revenue,
        |  CAST(SUM(revd) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    AS cum_revenue
        |FROM r""".stripMargin,
    // user-day grain, LAG for the 7-day returning window, integer days
    "growth_accounting" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM a GROUP BY 1),
        |l AS (
        |  SELECT a.user_id, a.day, f.first_day,
        |    lag(a.day) OVER (PARTITION BY a.user_id ORDER BY a.day)
        |      AS prev_day
        |  FROM a JOIN f ON f.user_id = a.user_id)
        |SELECT day,
        |  CASE WHEN day = first_day THEN 'new'
        |       WHEN prev_day >= day - 7 THEN 'returning'
        |       ELSE 'resurrected' END AS status,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM l GROUP BY 1, 2""".stripMargin,
    // integer dow/hour axes: (epoch_days + 3) % 7, 0 = Monday
    "activity_heatmap" ->
      """SELECT
        |  CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow,
        |  CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // integer errors over the densified grid, one divide per metric
    "forecast_backtest" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT dd.day, tt.event_type,
        |    CAST(COALESCE(daily.n, 0) AS BIGINT) AS n
        |  FROM (SELECT DISTINCT day FROM daily) dd
        |  CROSS JOIN (SELECT DISTINCT event_type FROM daily) tt
        |  LEFT JOIN daily
        |    ON daily.day = dd.day AND daily.event_type = tt.event_type),
        |s AS (
        |  SELECT t.event_type, t.n - p.n AS err
        |  FROM grid t JOIN grid p
        |    ON p.event_type = t.event_type AND t.day = p.day + 7)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(SUM(abs(err)) AS BIGINT) AS total_abs,
        |  CAST(SUM(err) AS BIGINT) AS total_err,
        |  CAST(SUM(abs(err)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mae,
        |  CAST(SUM(err) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bias
        |FROM s GROUP BY 1""".stripMargin,
    // mirrors seasonalDecompose: same observed-day grid, ROWS +-3
    // window sums (integer), x7 deviation, one fixed divide chain
    "seasonal_decompose" ->
      """WITH sd_d AS (
        |  SELECT event_type,
        |    (epoch_us(ts) - epoch_us(ts) % 86400000000) // 86400000000
        |      AS day
        |  FROM events),
        |sd_c AS (
        |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
        |  FROM sd_d GROUP BY 1, 2),
        |sd_g AS (
        |  SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
        |  FROM (SELECT DISTINCT day FROM sd_c) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM sd_c) t
        |  LEFT JOIN sd_c c
        |    ON c.day = d.day AND c.event_type = t.event_type),
        |sd_w AS (
        |  SELECT event_type, day, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wsum,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wcnt
        |  FROM sd_g),
        |sd_t AS (
        |  SELECT event_type, day % 7 AS dow, 7 * n - wsum AS dev_x7
        |  FROM sd_w WHERE wcnt = 7)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(SUM(dev_x7) AS BIGINT) AS sum_dev_x7,
        |  CAST(SUM(dev_x7) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    / CAST(7.0 AS DOUBLE) AS seas_dev
        |FROM sd_t GROUP BY 1, 2""".stripMargin,
    // scaled-integer CUSUM: D*S_i - i*T, argmax by (|stat| desc, day)
    "cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT dd.day, tt.event_type,
        |    CAST(COALESCE(daily.n, 0) AS BIGINT) AS n
        |  FROM (SELECT DISTINCT day FROM daily) dd
        |  CROSS JOIN (SELECT DISTINCT event_type FROM daily) tt
        |  LEFT JOIN daily
        |    ON daily.day = dd.day AND daily.event_type = tt.event_type),
        |cum AS (
        |  SELECT event_type, day, n,
        |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS i
        |  FROM grid),
        |tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS days
        |  FROM grid GROUP BY 1),
        |scored AS (
        |  SELECT c.event_type, c.day,
        |    t.days * c.cum - c.i * t.total AS cusum_scaled,
        |    t.days, t.total,
        |    row_number() OVER (PARTITION BY c.event_type
        |      ORDER BY abs(t.days * c.cum - c.i * t.total) DESC, c.day)
        |      AS rk
        |  FROM cum c JOIN tot t ON t.event_type = c.event_type)
        |SELECT event_type, day AS cp_day, cusum_scaled, days, total
        |FROM scored WHERE rk = 1""".stripMargin,
    // identical md5 cell algebra on both key columns; SUMs of BIGINT
    // products widen to HUGEINT in DuckDB — CAST back (SKILL.md)
    "cms_join_size" ->
      """WITH ha AS (
        |  SELECT o_orderkey AS k, s.s AS seed,
        |    ('0x' || substr(md5(CAST(s.s AS VARCHAR) || '|' ||
        |       CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 256 AS bucket
        |  FROM orders, (VALUES (0),(1),(2),(3)) s(s)),
        |ca AS (SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM ha GROUP BY 1, 2),
        |hb AS (
        |  SELECT l_orderkey AS k, s.s AS seed,
        |    ('0x' || substr(md5(CAST(s.s AS VARCHAR) || '|' ||
        |       CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT % 256 AS bucket
        |  FROM lineitem, (VALUES (0),(1),(2),(3)) s(s)),
        |cb AS (SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS nb
        |       FROM hb GROUP BY 1, 2),
        |est AS (
        |  SELECT ca.seed, CAST(SUM(ca.n * cb.nb) AS BIGINT) AS cms_est
        |  FROM ca JOIN cb ON ca.seed = cb.seed AND ca.bucket = cb.bucket
        |  GROUP BY 1),
        |tru AS (
        |  SELECT CAST(SUM(a.na * b.nl) AS BIGINT) AS true_size
        |  FROM (SELECT o_orderkey AS k, COUNT(*) AS na
        |        FROM orders GROUP BY 1) a
        |  JOIN (SELECT l_orderkey AS k, COUNT(*) AS nl
        |        FROM lineitem GROUP BY 1) b ON a.k = b.k)
        |SELECT est.seed, est.cms_est, tru.true_size,
        |  est.cms_est >= tru.true_size AS never_under
        |FROM est, tru""".stripMargin,
    "cms_point_estimates" ->
      """WITH h AS (
        |  SELECT user_id, s.s AS seed,
        |    ('0x' || substr(md5(CAST(s.s AS VARCHAR) || '|' ||
        |       CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 256 AS bucket
        |  FROM events, (VALUES (0),(1),(2),(3)) s(s)),
        |cells AS (SELECT seed, bucket, COUNT(*) AS n
        |          FROM h GROUP BY 1, 2),
        |truth AS (SELECT user_id, COUNT(*) AS true_n
        |          FROM events GROUP BY 1),
        |coords AS (SELECT DISTINCT user_id, seed, bucket FROM h),
        |est AS (
        |  SELECT c.user_id, MIN(cl.n) AS cms_est
        |  FROM coords c
        |  JOIN cells cl ON cl.seed = c.seed AND cl.bucket = c.bucket
        |  GROUP BY 1)
        |SELECT t.user_id, t.true_n, e.cms_est,
        |  e.cms_est >= t.true_n AS never_under
        |FROM truth t JOIN est e ON t.user_id = e.user_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, order_rank, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS order_rank,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |) WHERE order_rank <= 3""".stripMargin,
    "events_window_agg" ->
      """SELECT (epoch_us(ts) // 1000000) // 300 * 300 AS window_start,
        |  event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "funnel_steps" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |  GROUP BY e.user_id)
        |SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |UNION ALL
        |SELECT 'click', CAST(count(*) AS BIGINT) FROM c
        |UNION ALL
        |SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p""".stripMargin,
    "bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "semi_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |  AND c_custkey NOT IN (
        |    SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin,
    "rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "quantiles_agg" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // the oracle for the approx gate is the constant-true bounds frame:
    // any sketch regression past its ε flips a boolean and hash-fails
    "quantiles_approx_bounds" ->
      """SELECT l_returnflag,
        |  TRUE AS q50_within_eps,
        |  TRUE AS cd_within_eps,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
