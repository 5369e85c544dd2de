package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Native z_order2 expression and the cluster() layout operator:
  * kernel correctness vs a per-bit reference, SQL registration,
  * codegen participation, and the locality property that justifies
  * the layout — z-clustered partitions bound BOTH dimensions. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Per-bit reference interleave. */
  private def zSlow(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("z2 matches the per-bit reference on edge and random values") {
    val cases = Seq[(Long, Long)]((0L, 0L), (1L, 0L), (0L, 1L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL),
      (12345L, 67890L), (0xDEADBEEFL, 0xCAFEBABEL),
      // bits above 32 must be masked off
      (0x1_0000_0005L, 3L))
    for ((x, y) <- cases)
      assert(ZOrder.z2(x, y) == zSlow(x & 0xFFFFFFFFL, y & 0xFFFFFFFFL),
        s"($x,$y)")
  }

  test("z-clustered FILES bound 2-D box queries: per-file min/max " +
      "stats admit few candidate files; round-robin admits all") {
    val ev = sf("events").limit(20000)
      .select($"event_id", $"user_id", $"value")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_zlayout").toString
    ev.repartition(16).write.mode("overwrite").parquet(s"$tmp/rr")
    ZOrder.cluster(ev, $"event_id", $"user_id", 16)
      .write.mode("overwrite").parquet(s"$tmp/z")
    // per-file column stats, as a reader (or the parquet footer
    // pruner) would see them — plan-independent locality proof
    def stats(dir: String) = spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("f"))
      .agg(min($"event_id").as("elo"), max($"event_id").as("ehi"),
        min($"user_id").as("ulo"), max($"user_id").as("uhi"))
    // the box: one 1/16 event-id stripe x the low half of the users
    val ids = ev.agg(min($"event_id"), max($"event_id"))
      .as[(Long, Long)].head()
    val (eLo, eHi) = (ids._1, ids._1 + (ids._2 - ids._1) / 16)
    val (uLo, uHi) = (0L, 7L)
    def candidates(dir: String): Long = stats(dir)
      .filter($"elo" <= eHi && $"ehi" >= eLo &&
        $"ulo" <= uHi && $"uhi" >= uLo)
      .count()
    val rr = candidates(s"$tmp/rr")
    val z = candidates(s"$tmp/z")
    // round-robin spreads every (user, day) region across all files;
    // z-clustering confines the box to a few contiguous z-ranges
    assert(rr >= 14, s"round-robin candidates: $rr")
    assert(z * 3 <= rr, s"z candidates $z not < rr/3 ($rr)")
    // and the layouts hold identical content
    def sig(dir: String) = spark.read.parquet(dir)
      .agg(count(lit(1)), sum($"event_id"), sum($"user_id"))
      .as[(Long, Long, Long)].head()
    assert(sig(s"$tmp/rr") == sig(s"$tmp/z"))
  }

  test("z2 is monotone in each dimension within a fixed other") {
    val zs = (0L to 100L).map(x => ZOrder.z2(x, 7L))
    assert(zs == zs.sorted)
  }

  test("z_order2 is SQL-registered and null-safe") {
    val r = spark.sql(
      "SELECT z_order2(5, 6) AS z, z_order2(CAST(NULL AS BIGINT), 1) AS zn")
      .collect().head
    assert(r.getLong(0) == 57L)
    assert(r.isNullAt(1))
  }

  test("z_order2 runs inside whole-stage codegen") {
    val plan = sf("events")
      .select(ZOrder.zOrder2($"user_id", $"event_id").as("z"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [z_order2"), plan)
  }

  test("cluster() bounds both dimensions per partition; x-sort does not") {
    // synthetic uniform grid: both dims 0..255, 64k points
    val pts = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))

    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df
        .select(col("x"), col("y"),
          org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .groupBy("p")
        .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .agg(avg("rx"), avg("ry")).as[(Double, Double)].head()
      r
    }

    val (zx, zy) = avgRanges(ZOrder.cluster(pts, col("x"), col("y"), 16))
    val xSorted = pts.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
    val (sx, sy) = avgRanges(xSorted)

    // x-sorted: x tightly bounded but y spans the full 0..255 range —
    // a y-only predicate prunes NOTHING in this layout.
    assert(sx < 32.0, s"x-sorted x-range $sx")
    assert(sy > 200.0, s"x-sorted y-range $sy")
    // z-clustered: BOTH dims well under half the domain per partition,
    // so predicates on either (or both) columns skip partitions.
    assert(zx < 128.0, s"z x-range $zx")
    assert(zy < 128.0, s"z y-range $zy")
  }
}
