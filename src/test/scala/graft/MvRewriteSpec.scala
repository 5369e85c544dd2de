package graft

import org.apache.spark.sql.functions._

import graft.plans.{MvCatalog, MvRewrite}

/** Pins [[graft.plans.MvRewrite]]: the rewritten plan scans the
  * in-memory summary (not parquet), answers are bit-identical to the
  * un-rewritten plan, and non-subsumed aggregates are left alone. */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def registered(): Unit =
    MvCatalog.registerSummary(s"spec_li:$dir",
      Tables(spark, dir, "lineitem"), s"$dir/lineitem.parquet",
      keys = Seq("l_returnflag", "l_linestatus"),
      covered = Seq("l_linenumber", "l_shipdate"))

  private def query(s: org.apache.spark.sql.SparkSession) =
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_linenumber").as("sl"),
        min($"l_shipdate").as("lo"), max($"l_shipdate").as("hi"))

  test("rewritten plan scans the summary, not parquet") {
    registered()
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    val df = query(on)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan)
    // rollup signature: the aggregate re-rolls MV partials
    assert(plan.contains("sum(cnt_rows"), plan)
    // no FileScan ABOVE the cached relation (the InMemoryRelation
    // node prints its own definition subtree, which does scan parquet)
    val aboveCache = plan.linesIterator
      .takeWhile(!_.contains("InMemoryRelation")).toSeq
    assert(aboveCache.forall(!_.contains("FileScan")),
      aboveCache.mkString("\n"))
  }

  test("rewrite changes the plan, not the answer") {
    registered()
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    val off = spark.newSession()
    off.conf.set(MvRewrite.EnabledKey, "false")
    val a = query(on).collect().map(_.toString).sorted
    val b = query(off).collect().map(_.toString).sorted
    assert(a.nonEmpty && (a sameElements b))
  }

  test("key-column filter commutes through the rewrite") {
    registered()
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    val off = spark.newSession()
    def q(s: org.apache.spark.sql.SparkSession) =
      Tables(s, dir, "lineitem")
        .filter(col("l_linestatus") === "F")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), max($"l_shipdate").as("hi"))
    val plan = q(on).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(q(on).collect().map(_.toString).sorted sameElements
      q(off).collect().map(_.toString).sorted)
  }

  test("non-key filter blocks the rewrite") {
    registered()
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    val df = Tables(on, dir, "lineitem")
      .filter($"l_linenumber" > 2) // covered but NOT a key
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    assert(df.queryExecution.executedPlan.toString
      .contains("lineitem.parquet"))
  }

  test("double sums are NOT rewritten (no silent answer change)") {
    registered()
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    // l_quantity is double: partial re-aggregation is not bit-stable,
    // so the rule must refuse even though the keys match
    val df = Tables(on, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sq"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lineitem.parquet"), plan)
  }

  test("uncovered columns and foreign tables are left alone") {
    registered()
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    val uncovered = Tables(on, dir, "lineitem")
      .groupBy($"l_returnflag").agg(sum($"l_orderkey").as("so"))
    assert(uncovered.queryExecution.executedPlan.toString
      .contains("lineitem.parquet"))
    val foreign = Tables(on, dir, "orders")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    assert(foreign.queryExecution.executedPlan.toString
      .contains("orders.parquet"))
  }

  test("every (keys x filter) combination: rewrite fires and answers " +
      "are bit-identical") {
    registered()
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    val off = spark.newSession()
    val keyCombos = Seq(Seq("l_returnflag"), Seq("l_linestatus"),
      Seq("l_returnflag", "l_linestatus"))
    val filters: Seq[org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame] =
      Seq(identity, _.filter(col("l_returnflag") =!= "A"))
    for (ks <- keyCombos; f <- filters) {
      def q(s: org.apache.spark.sql.SparkSession) =
        f(Tables(s, dir, "lineitem"))
          .groupBy(ks.map(col): _*)
          .agg(count(lit(1)).as("n"),
            sum($"l_linenumber").as("s"),
            count($"l_linenumber").as("cn"),
            min($"l_linenumber").as("mn"),
            max($"l_shipdate").as("hi"))
      val plan = q(on).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), s"$ks no rewrite:\n$plan")
      val a = q(on).collect().map(_.toString).sorted
      val b = q(off).collect().map(_.toString).sorted
      assert(a.nonEmpty && (a sameElements b), s"$ks mismatch")
    }
  }

  test("global COUNT over an EMPTY base stays 0 through the rewrite " +
      "(COUNT->SUM(summary) would be NULL without the coalesce)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mv_empty").toString
    val suffix = "empty_li.parquet"
    Tables(spark, dir, "lineitem").filter(lit(false))
      .write.mode("overwrite").parquet(s"$tmp/$suffix")
    val base = spark.read.parquet(s"$tmp/$suffix")
    MvCatalog.registerSummary(s"spec_empty:$tmp", base, suffix,
      keys = Seq("l_returnflag"), covered = Seq("l_linenumber"))
    val on = spark.newSession()
    on.conf.set(MvRewrite.EnabledKey, "true")
    def q(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$tmp/$suffix")
        .agg(count(lit(1)).as("n"), count($"l_linenumber").as("nn"))
    // the rewrite fires (global agg, empty grouping passes the key
    // subset check) ...
    val plan = q(on).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan)
    // ... and the answer is COUNT's 0, not SUM-over-no-rows NULL
    val row = q(on).collect()(0)
    assert(!row.isNullAt(0) && row.getLong(0) == 0L, row.toString)
    assert(!row.isNullAt(1) && row.getLong(1) == 0L, row.toString)
  }

  test("disabled conf leaves the plan untouched") {
    registered()
    val df = query(spark) // shared session: conf defaults to off
    assert(df.queryExecution.executedPlan.toString
      .contains("lineitem.parquet"))
  }
}
