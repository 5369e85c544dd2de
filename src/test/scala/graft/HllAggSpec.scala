package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.queries.AnalyticsQueries

/** [[graft.functions.HllEstAgg]] — the custom TypedImperativeAggregate
  * must agree bit-for-bit with the relational register algebra and be
  * invariant to partitioning (merge = cell-wise max is the whole
  * distributed-correctness claim). */
class HllAggSpec extends SparkSpec {
  import spark.implicits._

  test("imperative estimate equals the relational register twin " +
      "bit-for-bit on sf0.001") {
    val ev = sf("events").select(col("event_type"), col("user_id"))
    val native = ev.select(col("event_type"),
        TextFunctions.hash32(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(expr("graft_hll_est(h)").as("est"))
      .as[(String, Double)].collect().toMap
    val m = 64
    val relational = AnalyticsQueries
      .hllRegisters(ev, col("event_type"), col("user_id"))
      .groupBy(col("g"))
      .agg(sum(expr("double(1.0) / double(shiftleft(1L, reg))"))
          .as("isum"),
        count(lit(1)).as("nz"))
      .select(col("g"),
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
          * lit(64.0) * lit(64.0) /
          (col("isum") + (lit(m) - col("nz")).cast("double"))).as("est"))
      .as[(String, Double)].collect().toMap
    assert(native.keySet == relational.keySet)
    native.foreach { case (k, v) =>
      assert(v == relational(k), s"group $k: $v != ${relational(k)}")
    }
  }

  test("estimate is partitioning-invariant (merge correctness)") {
    val base = (1L to 500L).map(i => ("g" + (i % 3), i)).toDF("g", "k")
      .select(col("g"), TextFunctions.hash32(col("k").cast("string"))
        .as("h"))
    def est(parts: Int): Map[String, Double] =
      base.repartition(parts).groupBy(col("g"))
        .agg(expr("graft_hll_est(h)").as("est"))
        .as[(String, Double)].collect().toMap
    assert(est(1) == est(7))
    assert(est(7) == est(32))
  }

  test("null hashes are ignored; empty group never divides by zero") {
    val df = Seq((Some(1L), "a"), (None, "a"), (None, "b"))
      .toDF("h", "g")
    val out = df.groupBy(col("g"))
      .agg(expr("graft_hll_est(h)").as("est"))
      .as[(String, Double)].collect().toMap
    // all-null group: all 64 registers at 0 -> zsum = 64, est = alpha*64
    val alpha = 0.7213 / (1.0 + 1.079 / 64.0)
    assert(out("b") == alpha * 64.0 * 64.0 / 64.0)
    assert(out("a") > out("b")) // one real key raises the estimate
  }
}
