package graft.ext

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}

/** Bloom-filtered semi-join — the "runtime filter" shape for selective
  * joins at 100 TB.
  *
  * A plain `fact ⋉ dim` semi-join shuffles EVERY fact row on the join
  * key, even when only a sliver of them survive. This operator builds
  * a bloom filter over the dim keys (distributed partial aggregation —
  * Spark's own `BloomFilterAggregate` sketch), ships the resulting
  * few-MB bitmap to every scan task (a binary literal, exactly like a
  * broadcast var), and drops non-matching fact rows AT THE SCAN,
  * before the shuffle. The exact semi-join then runs on the survivors
  * only, absorbing the bloom's false positives — so results are
  * IDENTICAL to the plain semi-join (gated against a plain `IN`
  * oracle) while the shuffle carries ~selectivity × |fact| rows.
  *
  * This is the same mechanism Catalyst's `InjectRuntimeFilter` applies
  * automatically when statistics justify it; exposing it as an
  * operator lets a pipeline force the shape where stats are missing
  * (fresh parquet drops, no ANALYZE) — the normal state of a
  * training-data lake.
  *
  * Both sides hash with `XxHash64` (the hash `InjectRuntimeFilter`
  * itself uses); key expressions must be the SAME TYPE on both sides —
  * xxhash64 of an INT and a BIGINT differ.
  */
object Bloom {

  /** Bloom sketch aggregate over `key`: `graft_bloom_agg(key, items,
    * bits) -> binary`. Requires [[register]]ed session. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", key, lit(expectedItems), lit(numBits))

  /** Per-row membership probe against a bloom binary (built by
    * [[bloomAgg]] over xxhash64 of the same key type). False positives
    * possible, false negatives never. */
  def bloomContains(bloom: Column, key: Column): Column =
    call_function("graft_bloom_contains", bloom, key)

  /** Optimal bloom bit count for `n` items at false-positive rate
    * `fpp` (standard -n·ln(fpp)/ln²2 formula, clamped to [64, maxBits]). */
  def optimalNumBits(n: Long, fpp: Double, maxBits: Long = 67108864L): Long = {
    require(fpp > 0 && fpp < 1, "fpp in (0,1)")
    val bits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.max(64L, math.min(bits, maxBits))
  }

  /** Exact semi-join with a bloom pre-filter: keep fact rows whose
    * `factKey` appears in `dim`'s `dimKey`. The bloom bitmap is
    * aggregated distributed, collected once (one row, ≤ `numBits/8`
    * bytes — the same driver hop any broadcast pays), embedded as a
    * literal so the probe folds into the fact scan's codegen, then an
    * exact left-semi join removes the false positives.
    *
    * At 100 TB: dim aggregates map-side into one bitmap; the fact
    * side's shuffle shrinks from |fact| to ~selectivity·|fact| rows.
    * The final semi-join still broadcasts or shuffles `dim` itself —
    * the bloom only cuts the FACT side, which is the one that hurts. */
  def bloomSemiJoin(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bits = optimalNumBits(expectedItems, fpp)
    val bloom = dim
      .agg(bloomAgg(dimKey, expectedItems, bits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val dimKeys = dim.select(dimKey.as("__bloom_key")).distinct()
    fact
      .filter(bloomContains(lit(bloom), factKey))
      .join(dimKeys, factKey === col("__bloom_key"), "left_semi")
  }

  /** SparkSessionExtensions hook wiring the two bloom functions onto
    * Spark's native sketch expressions (`BloomFilterAggregate` /
    * `BloomFilterMightContain` — the exact expressions Catalyst's
    * InjectRuntimeFilter plants). The value side is wrapped in
    * XxHash64 here so callers pass raw keys. */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"graft_bloom_agg takes (key, items, bits), got ${children.size}")
        new BloomFilterAggregate(new XxHash64(Seq(children.head)),
          children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bloom_contains takes (bloom, key), got ${children.size}")
        new BloomFilterMightContain(children.head,
          new XxHash64(Seq(children(1))))
      }))
  }
}
