package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.ext.TemporalJoins
import graft.plans.AsOfJoinNative

/** [[graft.plans.AsOfJoinNative]] — the custom physical operator must
  * (a) actually plan as AsOfJoinExec, (b) agree row-for-row with the
  * composed union+window operator on real tables AND adversarial
  * edge cases, (c) keep left-outer/tie semantics. */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("plans an AsOfJoinExec node (not a window or join fallback)") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "x")).toDF("k2", "t2", "rv")
    val out = AsOfJoinNative.asofBackward(l, r, "k", "k2", "t", "t2")
    val s = out.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix
    assert(s.contains("AsOfJoin"), s"expected AsOfJoin in plan:\n$s")
    assert(!s.contains("Window") && !s.contains("SortMergeJoin"),
      s"fallback plan detected:\n$s")
    // EnsureRequirements plans exactly one exchange + sort per side
    assert(s.linesIterator.count(_.contains("Exchange")) == 2, s)
    assert(s.linesIterator.count(_.contains("- Sort [")) == 2, s)
  }

  test("pre-partitioned inputs plan ZERO exchanges (declared " +
      "distribution is satisfied, not re-shuffled)") {
    val l = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("k", "t", "lv")
      .repartition(4, col("k"))
    val r = Seq((1L, 5L, "x")).toDF("k2", "t2", "rv")
      .repartition(4, col("k2"))
    val out = AsOfJoinNative.asofBackward(l, r, "k", "k2", "t", "t2")
    out.collect() // finalize any adaptive planning
    val s = out.queryExecution.executedPlan.toString
    // the only exchanges are the inputs' own REPARTITION_BY_NUM; the
    // join must add NO ENSURE_REQUIREMENTS exchange on top (its
    // required ClusteredDistribution is already satisfied). AQE's
    // isFinalPlan string prints the tree twice — assert by origin
    // tag, not by line count.
    assert(s.contains("REPARTITION_BY_NUM"), s)
    assert(!s.contains("ENSURE_REQUIREMENTS"),
      s"join added its own exchange:\n$s")
  }

  test("edge cases: ties match, unmatched stay null, interleaved keys") {
    val l = Seq(
      (1L, 10L, "l-a"),   // matches r at t=10 (tie)
      (1L, 9L, "l-b"),    // matches r at t=5
      (1L, 4L, "l-c"),    // no right row at/before 4 -> null
      (2L, 100L, "l-d"),  // key 2 has no right rows at all -> null
      (3L, 7L, "l-e"))    // matches key-3 row at 7 (tie), not key 1's
      .toDF("k", "t", "lv")
    val r = Seq(
      (1L, 5L, "r-5"), (1L, 10L, "r-10"), (1L, 11L, "r-11"),
      (3L, 7L, "r-7"))
      .toDF("k2", "t2", "rv")
    val out = AsOfJoinNative.asofBackward(l, r, "k", "k2", "t", "t2")
      .select(col("lv"), col("rv")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map(
      "l-a" -> Some("r-10"), "l-b" -> Some("r-5"), "l-c" -> None,
      "l-d" -> None, "l-e" -> Some("r-7")))
  }

  test("agrees with the composed union+window operator on sf0.001") {
    val events = sf("events").select(col("event_id"),
      col("user_id"), col("ts"))
    val lastOrders = sf("orders")
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    val native = AsOfJoinNative.asofBackward(events, lastOrders,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("last_orderkey"))
    val composed = TemporalJoins.asofJoinBackward(events, lastOrders,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("last_orderkey"))
    assert(sorted(native) == sorted(composed))
    assert(native.count() == events.count())
  }

  test("asofForward (negated-time reuse) agrees with the composed " +
      "forward operator on sf0.001") {
    val events = sf("events").select(col("event_id"),
      col("user_id"), col("ts"))
    val firstOrders = sf("orders")
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("next_orderkey"))
    val native = AsOfJoinNative.asofForward(events, firstOrders,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("next_orderkey"))
    val composed = TemporalJoins.asofJoinForward(events, firstOrders,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("next_orderkey"))
    assert(sorted(native) == sorted(composed))
  }

  test("asofForward tie at equal time matches (rt >= lt inclusive)") {
    val l = Seq((1L, 10L, "a"), (1L, 11L, "b")).toDF("k", "t", "lv")
    val r = Seq((1L, 10L, "r10"), (1L, 20L, "r20")).toDF("k2", "t2", "rv")
    val out = AsOfJoinNative.asofForward(l, r, "k", "k2", "t", "t2")
      .select(col("lv"), col("rv")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map("a" -> Some("r10"), "b" -> Some("r20")))
  }

  test("property: native agrees with composed on seeded random frames") {
    // deterministic LCG so the spec replays identically
    for (seed <- Seq(7L, 99L, 12345L)) {
      var s = seed
      def nxt(mod: Long): Long = {
        s = s * 6364136223846793005L + 1442695040888963407L
        math.floorMod(s >>> 16, mod)
      }
      val left = (1 to 400).map(i =>
        (nxt(17), nxt(50), i.toLong)).toDF("k", "t", "lid")
      val right = (1 to 300).map(i =>
        (nxt(17), nxt(50), i.toLong)).toDF("k2", "t2", "rid")
        // composed/native both require unique (key, time) on the right
        .groupBy(col("k2"), col("t2"))
        .agg(max(col("rid")).as("rid"))
      val native = AsOfJoinNative.asofBackward(left, right,
        "k", "k2", "t", "t2").select(col("lid"), col("rid"))
      val composed = TemporalJoins.asofJoinBackward(left, right,
        "k", "k2", "t", "t2").select(col("lid"), col("rid"))
      assert(sorted(native) == sorted(composed), s"seed $seed")
    }
  }

  test("unmatched rows null-pad NON-NULLABLE right columns (projection " +
      "binds against the nullability-adjusted output)") {
    // toDF on tuples of primitives yields non-nullable long/string
    // columns; the operator's output declares them nullable, and the
    // result projection must honor that — a projection bound against
    // the raw right schema reads the padding row without null checks
    // and silently turns NULL longs into 0 (and NPEs on strings).
    val l = Seq((1L, 10L, "hit"), (2L, 10L, "miss")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, 42L, "r")).toDF("k2", "t2", "rnum", "rstr")
    assert(!r.schema("rnum").nullable && !r.schema("k2").nullable &&
      !r.schema("t2").nullable)
    val rows = AsOfJoinNative.asofBackward(l, r, "k", "k2", "t", "t2")
      .select(col("lv"), col("k2"), col("t2"), col("rnum"), col("rstr"))
      .collect().map(x => x.getString(0) -> x).toMap
    val hit = rows("hit")
    assert(hit.getLong(1) == 1L && hit.getLong(3) == 42L &&
      hit.getString(4) == "r")
    val miss = rows("miss")
    for (i <- 1 to 4)
      assert(miss.isNullAt(i), s"col $i of unmatched row not NULL: $miss")
  }

  test("null keys and times never match but rows survive (left outer)") {
    val l = Seq((Some(1L), Some(10L), "ok"),
      (None, Some(10L), "nullkey"), (Some(1L), None, "nulltime"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "r")).toDF("k2", "t2", "rv")
    val out = AsOfJoinNative.asofBackward(l, r, "k", "k2", "t", "t2")
      .select(col("lv"), col("rv")).as[(String, Option[String])]
      .collect().toMap
    assert(out == Map("ok" -> Some("r"), "nullkey" -> None,
      "nulltime" -> None))
  }
}
