package graft

import org.apache.spark.sql.functions._

import graft.ext.TemporalJoins
import graft.queries.RelationalQueries

/** As-of join, binned range join, and the round-6 relational query
  * surface (pivot/cube/unnest/exact-moment stats). */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- as-of join

  private def asofFixture = {
    val left = Seq(
      (1L, 5L, "e1"),   // before any right row for key 1
      (1L, 10L, "e2"),  // exactly at right t=10: tie counts
      (1L, 25L, "e3"),  // after t=20
      (2L, 100L, "e4"), // key 2 has no right rows at all
      (3L, 7L, "e5")    // key 3's only right row is later (t=9)
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 10L, "r10"),
      (1L, 20L, "r20"),
      (3L, 9L, "r9")
    ).toDF("rk", "rt", "payload")
    (left, right)
  }

  test("asof backward: ties match, unmatched left rows keep null payload") {
    val (left, right) = asofFixture
    val got = TemporalJoins.asofJoinBackward(left, right, "k", "rk", "t", "rt")
      .select($"ev", $"payload").as[(String, Option[String])].collect().toMap
    assert(got == Map(
      "e1" -> None,          // nothing at or before t=5
      "e2" -> Some("r10"),   // rt=10 <= t=10 (tie)
      "e3" -> Some("r20"),   // most recent of {10, 20}
      "e4" -> None,          // key never appears on the right
      "e5" -> None))         // right row exists but is in the future
  }

  test("asof forward: ties match, nearest following wins, unmatched null") {
    val (left, right) = asofFixture
    val got = TemporalJoins.asofJoinForward(left, right, "k", "rk", "t", "rt")
      .select($"ev", $"payload").as[(String, Option[String])].collect().toMap
    assert(got == Map(
      "e1" -> Some("r10"),   // nearest at/after t=5 is rt=10
      "e2" -> Some("r10"),   // rt=10 >= t=10 (tie)
      "e3" -> None,          // nothing after t=25
      "e4" -> None,          // key never appears on the right
      "e5" -> Some("r9")))   // rt=9 >= t=7
  }

  test("asof backward: all left columns and right time survive") {
    val (left, right) = asofFixture
    val out = TemporalJoins.asofJoinBackward(left, right, "k", "rk", "t", "rt")
    assert(out.columns.toSeq == Seq("k", "t", "ev", "rt", "payload"))
    assert(out.count() == left.count()) // left-outer: row count preserved
  }

  test("asof backward plans one shuffle (key exchange), no join node") {
    val (left, right) = asofFixture
    val plan = TemporalJoins
      .asofJoinBackward(left, right, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    // union + window implementation: no join operator of any kind
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  // -------------------------------------------------- binned range join

  private def rangeFixture = {
    val points = Seq(0L, 5L, 10L, 14L, 15L, 99L).toDF("p")
    val ranges = Seq(
      ("a", 5L, 15L),   // catches 5, 10, 14 (15 excluded: half-open)
      ("b", 10L, 10L),  // empty interval: matches nothing
      ("c", 90L, 100L)  // catches 99
    ).toDF("name", "s", "e")
    (points, ranges)
  }

  test("range join: half-open semantics, empty intervals drop") {
    val (points, ranges) = rangeFixture
    val got = TemporalJoins
      .binnedRangeJoin(points, "p", ranges, "s", "e", binWidth = 10L)
      .select($"name", $"p").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 5L), ("a", 10L), ("a", 14L), ("c", 99L)))
  }

  test("range join agrees with the naive inequality join on sf0.001") {
    val week = 7L * 86400L
    val points = sf("lineitem")
      .select(unix_seconds($"l_shipdate".cast("timestamp")).as("ship_s"))
    val ranges = sf("orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey",
        unix_seconds($"o_orderdate".cast("timestamp")).as("start_s"))
      .withColumn("end_s", $"start_s" + lit(week))
    val binned = TemporalJoins
      .binnedRangeJoin(points, "ship_s", ranges, "start_s", "end_s", week)
      .groupBy($"o_orderkey").count()
    val naive = points.join(ranges,
        $"ship_s" >= $"start_s" && $"ship_s" < $"end_s")
      .groupBy($"o_orderkey").count()
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("range join explodes each interval to at most 2 bins at binWidth=len") {
    val (_, ranges) = rangeFixture
    val bins = ranges.filter($"e" > $"s")
      .withColumn("nbins",
        floor(($"e" - 1) / lit(10L)) - floor($"s" / lit(10L)) + 1)
      .select($"nbins").as[Long].collect()
    assert(bins.forall(_ <= 2), bins.toSeq)
  }

  // ------------------------------------- gated query surface smoke (sf0.001)

  test("round-6 relational queries run and return rows on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- RelationalQueries.queries) {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("stats_agg: exact-moment stddev/corr match Spark's built-ins to 1e-6") {
    val got = RelationalQueries.statsAgg(spark, "/root/testdata/sf0.001")
      .select($"l_returnflag", $"stddev_qty", $"corr_qty_price")
      .as[(String, Double, Double)].collect()
      .map { case (k, s, c) => k -> (s, c) }.toMap
    val ref = sf("lineitem").groupBy($"l_returnflag")
      .agg(stddev_samp($"l_quantity").as("s"),
        corr($"l_quantity", $"l_extendedprice").as("c"))
      .as[(String, Double, Double)].collect()
      .map { case (k, s, c) => k -> (s, c) }.toMap
    for ((k, (s, c)) <- got) {
      assert(math.abs(s - ref(k)._1) < 1e-6, s"stddev $k")
      assert(math.abs(c - ref(k)._2) < 1e-6, s"corr $k")
    }
  }

  test("cube_agg gid bitmask: first grouping column is the MSB") {
    val byGid = RelationalQueries.cubeAgg(spark, "/root/testdata/sf0.001")
      .select($"gid", $"l_returnflag", $"l_linestatus").collect()
      .groupBy(_.getLong(0))
    // gid=1: linestatus rolled up; gid=2: returnflag rolled up
    assert(byGid(1L).forall(r => r.isNullAt(2) && !r.isNullAt(1)))
    assert(byGid(2L).forall(r => r.isNullAt(1) && !r.isNullAt(2)))
    assert(byGid(3L).forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }
}
