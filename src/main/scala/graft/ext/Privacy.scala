package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Privacy / governance operators for aggregate release — the audit
  * side of a training-data platform (the scrub side lives in
  * [[graft.functions.TextFunctions.redactPii]]).
  *
  * Reference analog: none (`M/` is ETL-only); these extend the engine
  * the same way the dedup/similarity families do.
  *
  * Scale design: both operators are single hash-aggregate shapes —
  * group on the quasi-identifier tuple, one map-side-combined count,
  * then pure per-row arithmetic. No windows, no second scan, no
  * driver state: at 100 TB the cost is exactly one shuffle on the
  * release's group keys, the same shuffle the release itself already
  * pays.
  */
object Privacy {

  /** k-anonymity audit of an aggregate release keyed by
    * quasi-identifiers: per equivalence class (distinct quasi-id
    * tuple) its size `n`, an `at_risk` flag (n < k — any row in the
    * class is re-identifiable to within n candidates), and the
    * suppressed release value `released_n` (NULL for at-risk classes
    * — the standard small-cell suppression rule census-style releases
    * apply before publication). The caller publishes
    * (quasi-ids, released_n) and routes `at_risk` rows to
    * generalization/suppression upstream. */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[Column], k: Int)
      : DataFrame = {
    require(k >= 2, "k-anonymity needs k >= 2")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
      .withColumn("released_n",
        when(col("n") >= k, col("n")).otherwise(lit(null).cast("long")))
  }

  /** Noisy count release: per-group counts plus bounded integer noise
    * derived DETERMINISTICALLY from the group key — noise =
    * (hash32(key ∥ salt) mod (2·bound+1)) − bound, uniform on
    * [−bound, bound].
    *
    * The deterministic sampler is the GATE seam, not the deployed
    * mechanism: a differentially-private release draws the noise from
    * a calibrated two-sided-geometric/Laplace RNG at publication time
    * (swap `noiseOf` — one Column), and determinism here is what
    * makes the plumbing hash-gateable cross-engine AND is itself the
    * production answer to averaging attacks (re-running a release
    * with fresh noise lets an attacker average it away; keying noise
    * on (group, salt) gives one fixed draw per release epoch, the
    * "sticky noise" convention). Counts are clamped at 0 so the
    * release never publishes a negative count. */
  def noisyCounts(df: DataFrame, groupKey: Column, bound: Int,
      salt: String = "noise-epoch-1"): DataFrame = {
    require(bound >= 1, "noise bound must be >= 1")
    val span = 2L * bound + 1L
    df.groupBy(groupKey.as("group_key"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise",
        pmod(TextFunctions.hash32(
            concat_ws("|", col("group_key").cast("string"), lit(salt))),
          lit(span)) - bound)
      .withColumn("released_n",
        greatest(col("n") + col("noise"), lit(0L)))
  }
}
