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

  /** t-closeness audit — the third leg of the release-audit family
    * (k-anonymity bounds class SIZE, l-diversity bounds sensitive
    * VARIETY, t-closeness bounds sensitive DISTRIBUTION SKEW): a
    * class whose sensitive-value distribution sits far from the
    * global one leaks that attribute even when both other audits
    * pass. Distance is the standard ordered-domain Earth Mover's
    * Distance, EMD = (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)| over the m
    * ordered sensitive values.
    *
    * Integer-exact: with class counts c (size n_c) and global counts
    * g (size N), the cumulative difference scales to
    * cum_c·N − cum_g·n_c — pure BIGINTs — so the EMD is ONE final
    * divide by n_c·N·(m−1) and the double hash-gates cross-engine.
    * Shape: one aggregate to (class, band) counts, a per-class
    * cumulative window over the GLOBAL band grid (classes densified
    * with zero counts so cumulatives align), the global cumulative
    * over ≤ m rows (bounded by the sensitive domain, not data), one
    * closing aggregate.
    *
    * Returns per class: n, emd, and the `t_close` flag (emd ≤ t). */
  def tClosenessAudit(df: DataFrame, quasiIds: Seq[Column],
      band: Column, t: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qNames = quasiIds.zipWithIndex.map { case (_, i) => s"_q$i" }
    val base = graft.Tables.materialize(
      df.select(quasiIds.zip(qNames).map { case (c, n) => c.as(n) }
        :+ band.as("_band"): _*))
    val cls = base.groupBy(qNames.map(col) :+ col("_band"): _*)
      .agg(count(lit(1)).as("c"))
    val glob = base.groupBy(col("_band")).agg(count(lit(1)).as("g"))
    val gcum = glob.withColumn("cum_g", sum(col("g")).over(
      Window.orderBy(col("_band"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = glob.agg(sum(col("g")).as("_N"),
      count(lit(1)).as("_m"))
    val grid = cls.select(qNames.map(col): _*).distinct()
      .crossJoin(broadcast(glob.select(col("_band"))))
      .join(cls, qNames :+ "_band", "left_outer")
      .select(qNames.map(col) :+ col("_band")
        :+ coalesce(col("c"), lit(0L)).as("c"): _*)
    val byClass = Window.partitionBy(qNames.map(col): _*)
    val cum = grid
      .withColumn("cum_c", sum(col("c")).over(byClass
        .orderBy(col("_band"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_c", sum(col("c")).over(byClass))
      .join(broadcast(gcum.select(col("_band"), col("cum_g"))), "_band")
      .crossJoin(broadcast(tot))
    cum.groupBy(qNames.map(col): _*)
      .agg(max(col("n_c")).as("n"),
        sum(abs(col("cum_c") * col("_N") - col("cum_g") * col("n_c")))
          .as("_num"),
        max(col("_N")).as("_Nx"), max(col("_m")).as("_mx"))
      .withColumn("emd",
        col("_num").cast("double") /
          (col("n") * col("_Nx") * (col("_mx") - 1)).cast("double"))
      .withColumn("t_close", col("emd") <= t)
      .drop("_num", "_Nx", "_mx")
  }
}
