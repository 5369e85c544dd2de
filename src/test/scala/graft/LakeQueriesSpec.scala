package graft

import org.apache.spark.sql.functions._

import graft.queries.LakeQueries

/** Round-9 lakehouse-maintenance operators: incremental aggregate
  * maintenance, snapshot diff, quantile binning. */
class LakeQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("incremental_agg: state merge equals single-pass rescan") {
    val merged = LakeQueries.incrementalAgg(spark, dir)
    val direct = sf("lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val got = merged.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got == direct)
    // avg is exactly sum/cnt in double arithmetic
    merged.collect().foreach { r =>
      assert(r.getDouble(6) == r.getDouble(2) / r.getLong(1).toDouble)
    }
  }

  test("snapshot_diff: classification matches the modulo carving") {
    val diff = LakeQueries.snapshotDiff(spark, dir).collect()
    val byType = diff.groupBy(_.getString(1))
    // every diff row's type is re-derivable from its key
    diff.foreach { r =>
      val k = r.getLong(0)
      r.getString(1) match {
        case "added" =>
          assert(k % 83 == 0 && k % 89 != 0)
          assert(r.isNullAt(2) && !r.isNullAt(3))
        case "deleted" =>
          assert(k % 89 == 0 && k % 83 != 0)
          assert(!r.isNullAt(2) && r.isNullAt(3))
        case "changed" =>
          assert(k % 97 == 0 && k % 83 != 0 && k % 89 != 0)
          assert(r.getDouble(3) == r.getDouble(2) * 1.1)
        case other => fail(s"unexpected change_type $other")
      }
    }
    // the carving produces all three classes at sf0.001 (1.5k orders,
    // keys up to ~6k span multiples of 83, 89, and 97)
    assert(byType.keySet == Set("added", "deleted", "changed"))
    // and unchanged keys never leak into the diff
    val n = sf("orders").count()
    assert(diff.length < n / 10)
  }

  test("compaction_plan: first-fit bins cover every doc, fill to target") {
    val target = 1L << 20
    val plan = LakeQueries.compactionPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = sf("documents")
    assert(plan.map(_._3).sum == docs.count())
    assert(plan.map(_._4).sum ==
      docs.agg(sum($"n_chars")).as[Long].head())
    plan.groupBy(_._1).foreach { case (_, rows) =>
      val byBin = rows.sortBy(_._2)
      // bins are contiguous from 0
      assert(byBin.map(_._2).toSeq == (0L until byBin.length))
      // doc ranges are disjoint and ordered across bins
      byBin.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5)
        case _ =>
      }
      // every non-final bin is filled: cumulative chars through bin b
      // reach past boundary (b+1)*target (its last member straddles)
      byBin.map(_._4).scanLeft(0L)(_ + _).drop(1).zipWithIndex
        .dropRight(1).foreach { case (cum, b) =>
          assert(cum >= (b + 1) * target)
        }
    }
  }

  test("dq_checks: full battery passes on the generated tables") {
    val got = LakeQueries.dqChecks(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(got.size == 6)
    assert(got.values.forall(_._2), s"failed checks: ${
      got.filter(!_._2._2).keys.mkString(",")}")
    assert(got("orders_nonempty")._1 == sf("orders").count().toDouble)
    assert(got("orders_custkey_null_frac")._1 == 0.0)
    assert(got("orders_pk_unique")._1 == 0.0)
    assert(got("lineitem_fk_orphans")._1 == 0.0)
    assert(got("lineitem_discount_in_range")._1 == 0.0)
  }

  test("dq_checks: verdicts actually flip on violating data") {
    import org.apache.spark.sql.functions._
    import graft.queries.LakeQueries.dqChecksOn
    def verdicts(orders: org.apache.spark.sql.DataFrame,
        li: org.apache.spark.sql.DataFrame): Map[String, Boolean] =
      dqChecksOn(orders, li).collect()
        .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    val goodOrders = sf("orders")
    val goodLi = sf("lineitem")
    // poison each dimension separately and assert ONLY its check flips
    val nullCust = goodOrders.withColumn("o_custkey",
      when($"o_orderkey" % 2 === 0, lit(null)).otherwise($"o_custkey"))
    val v1 = verdicts(nullCust, goodLi)
    assert(!v1("orders_custkey_null_frac") && v1("orders_pk_unique"))
    val dupKeys = goodOrders.unionByName(goodOrders.limit(5))
    val v2 = verdicts(dupKeys, goodLi)
    assert(!v2("orders_pk_unique") && v2("orders_custkey_null_frac"))
    val orphanLi = goodLi.withColumn("l_orderkey",
      when($"l_linenumber" === 1, -$"l_orderkey").otherwise($"l_orderkey"))
    val v3 = verdicts(goodOrders, orphanLi)
    assert(!v3("lineitem_fk_orphans"))
    val badDisc = goodLi.withColumn("l_discount",
      when($"l_linenumber" === 1, lit(7.5)).otherwise($"l_discount"))
    val v4 = verdicts(goodOrders, badDisc)
    assert(!v4("lineitem_discount_in_range") && v4("lineitem_fk_orphans"))
  }

  test("scd_type2 merge: changed key closes + reopens, new key " +
      "inserts, NULL->value counts as a change, unchanged untouched") {
    val d0 = to_date(lit("2024-01-01"))
    val d1 = to_date(lit("2024-06-01"))
    val current = Seq(
      (1L, Some("a")),  // unchanged
      (2L, Some("b")),  // changed b -> b2
      (3L, None))       // NULL -> c  (null-safe compare must fire)
      .toDF("k", "attr")
      .withColumn("valid_from", d0)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val batch = Seq(
      (1L, Some("a")), (2L, Some("b2")), (3L, Some("c")),
      (4L, Some("new")))  // brand-new key
      .toDF("k", "attr")
    val out = LakeQueries.scdType2Merge(current, batch, "k",
        Seq("attr"), d1)
      .select(col("k"), col("attr"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("vf"),
        date_format(col("valid_to"), "yyyy-MM-dd").as("vt"),
        col("is_current"))
      .as[(Long, Option[String], String, Option[String], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, Some("a"), "2024-01-01", None, true),          // untouched
      (2L, Some("b"), "2024-01-01", Some("2024-06-01"), false),
      (2L, Some("b2"), "2024-06-01", None, true),
      (3L, None, "2024-01-01", Some("2024-06-01"), false),
      (3L, Some("c"), "2024-06-01", None, true),
      (4L, Some("new"), "2024-06-01", None, true)))
  }

  test("quantile_bins: 10 deciles partition the table near-evenly") {
    val bins = LakeQueries.quantileBins(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(bins.map(_._1).toSeq == (1L to 10L))
    val n = sf("orders").count()
    assert(bins.map(_._2).sum == n)
    // interpolated decile edges: each bin within ±2% of n/10 + 1
    bins.foreach { case (_, cnt, _, _) =>
      assert(math.abs(cnt - n / 10.0) <= n * 0.02 + 1)
    }
    // bins are ordered, non-overlapping value ranges
    bins.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("scd_type2 merge: key with only CLOSED history re-enters as a " +
      "new current version (externally authored hard-delete)") {
    val d1 = to_date(lit("2024-06-01"))
    val current = Seq((5L, Some("x")))
      .toDF("k", "attr")
      .withColumn("valid_from", to_date(lit("2024-01-01")))
      .withColumn("valid_to", to_date(lit("2024-03-01")))
      .withColumn("is_current", lit(false)) // no open version anywhere
    val batch = Seq((5L, Some("y"))).toDF("k", "attr")
    val out = LakeQueries.scdType2Merge(current, batch, "k",
        Seq("attr"), d1)
      .select(col("k"), col("attr"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("vf"),
        date_format(col("valid_to"), "yyyy-MM-dd").as("vt"),
        col("is_current"))
      .as[(Long, Option[String], String, Option[String], Boolean)]
      .collect().toSet
    assert(out == Set(
      (5L, Some("x"), "2024-01-01", Some("2024-03-01"), false),
      (5L, Some("y"), "2024-06-01", None, true)))
  }
}
