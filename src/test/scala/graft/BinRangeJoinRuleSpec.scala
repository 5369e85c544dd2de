package graft

import org.apache.spark.sql.functions._

import graft.plans.BinRangeJoin

/** [[graft.plans.BinRangeJoin]] — the conf-gated logical rewrite that
  * turns nested-loop range joins into binned equi-joins. */
class BinRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withWidth[T](w: Long)(f: => T): T = {
    spark.conf.set(BinRangeJoin.WidthKey, w.toString)
    try f finally spark.conf.unset(BinRangeJoin.WidthKey)
  }

  private def points = Seq((1L, -25L), (2L, -10L), (3L, 0L), (4L, 7L),
    (5L, 19L), (6L, 42L)).toDF("pid", "t")
  private def ranges = Seq((10L, -30L, -20L), (11L, -5L, 8L),
    (12L, 18L, 20L), (13L, 40L, 40L), // empty interval: yields nothing
    (14L, 0L, 50L)).toDF("rid", "lo", "hi")

  private def joined = points.join(ranges,
    col("t") >= col("lo") && col("t") < col("hi"))

  test("rewrite fires: no nested-loop/cartesian in the physical plan, " +
      "results identical to the naive join") {
    val naive = joined.select("pid", "rid").as[(Long, Long)]
      .collect().toSet
    withWidth(10L) {
      val df = joined
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoop") &&
        !phys.contains("CartesianProduct"),
        s"rewrite did not fire:\n$phys")
      val got = df.select("pid", "rid").as[(Long, Long)].collect().toSet
      assert(got == naive)
      // negative values covered: point -25 in [-30,-20) via negative
      // floor-div bins; 19 in [18,20) crosses a bin boundary
      assert(got.contains((1L, 10L)) && got.contains((5L, 12L)))
      assert(!got.exists(_._2 == 13L)) // empty interval matches nothing
    }
  }

  test("rule is a no-op when the conf is unset or the shape differs") {
    // conf unset: plan keeps the nested loop (shape untouched)
    val physOff = joined.queryExecution.executedPlan.toString
    assert(physOff.contains("BroadcastNestedLoop") ||
      physOff.contains("CartesianProduct"))
    withWidth(10L) {
      // <= upper bound is NOT the half-open shape: must not rewrite
      val closed = points.join(ranges,
        col("t") >= col("lo") && col("t") <= col("hi"))
      val phys = closed.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastNestedLoop") ||
        phys.contains("CartesianProduct"))
      // and an equi-join is left alone (no accidental bin columns)
      val eq = points.join(ranges, col("t") === col("lo"))
      assert(!eq.columns.exists(_.startsWith("__g_bin")))
      assert(eq.count() == 1) // t=0 matches lo=0 of range 14
    }
  }

  test("property: rule output equals the naive join on random data " +
      "across widths (fixed seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error(s"gen failed for seed $seed"))
    val ptsGen = Gen.listOfN(80, Gen.choose(-200L, 200L))
    val rngGen = Gen.listOfN(40, for {
      a <- Gen.choose(-200L, 200L)
      span <- Gen.choose(-5L, 60L) // negative span = empty interval
    } yield (a, a + span))
    for (seed <- 1L to 4L; w <- Seq(1L, 7L, 64L)) {
      val ps = sample(ptsGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
      val rs = sample(rngGen, seed + 100).zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rid", "lo", "hi")
      def run = ps.join(rs,
          col("t") >= col("lo") && col("t") < col("hi"))
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      val naive = run
      val rewritten = withWidth(w)(run)
      assert(rewritten == naive, s"seed=$seed width=$w")
    }
  }

  test("rewrite handles a SQL-path range join too") {
    points.createOrReplaceTempView("brj_points")
    ranges.createOrReplaceTempView("brj_ranges")
    withWidth(10L) {
      val df = spark.sql(
        """SELECT p.pid, r.rid FROM brj_points p JOIN brj_ranges r
          |ON p.t >= r.lo AND p.t < r.hi""".stripMargin)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoop") &&
        !phys.contains("CartesianProduct"))
      assert(df.as[(Long, Long)].collect().toSet ==
        joined.select("pid", "rid").as[(Long, Long)].collect().toSet)
    }
  }
}
