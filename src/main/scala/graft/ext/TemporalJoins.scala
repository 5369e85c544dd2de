package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in equi-join can't express:
  * as-of (nearest-prior-match) joins and point-in-interval range
  * joins. Both are beyond the reference's operator set (SURVEY.md §2
  * records equi-join shapes only) — they are the standard missing
  * pieces a training-data/analytics pipeline hits first: "state of X
  * at event time" and "events inside a window".
  *
  * Scale design (100 TB): neither operator materializes a cartesian
  * product and neither touches the driver.
  *  - as-of: ONE shuffle of left∪right on the key, a per-partition
  *    sort (time, side), and a running `last(ignoreNulls)` window —
  *    the same O(n log n) merge a single-node engine does, but
  *    key-partitioned across executors. Skewed keys shard like any
  *    window (AQE handles the shuffle; a hot key is bounded by its
  *    own group size, never the table).
  *  - range: intervals explode to the O(len/binWidth) bins they
  *    overlap and points hash to exactly one bin, turning the
  *    inequality join into an equi-join on bin + a residual filter.
  *    With binWidth ≈ interval length each interval lands in ≤2
  *    bins, so shuffle volume is ~2×ranges + 1×points instead of
  *    |points|×|ranges| comparisons.
  */
object TemporalJoins {

  /** Backward as-of join: every left row picks up the payload of the
    * right row with the greatest `rightTime <= leftTime` for the same
    * key (left-outer semantics: unmatched left rows keep null
    * payload). Right rows must be unique per (key, time) — pre-reduce
    * duplicates (e.g. `groupBy(key, time).agg(...)`) or the match
    * among same-instant rows is undefined; this operator asserts
    * nothing and simply propagates whichever sorts last.
    *
    * Output columns: all of `left`, then all non-key columns of
    * `right` (the right time column rides along as the match's
    * timestamp).
    */
  def asofJoinBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct(payloadCols.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val rightType = right.select(rightStruct).schema.head.dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rightType).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"), rightStruct.as("__r"))

    // Sort puts a right row at time t BEFORE left rows at the same t,
    // so `rightTime <= leftTime` ties count as matches. The running
    // last(ignoreNulls) skips interleaved left rows (null __r).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftOut = left.columns.toSeq.map(c => col(s"__l.$c").as(c))
    val rightOut = payloadCols.map(c => col(s"__m.$c").as(c))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Forward as-of join: every left row picks up the payload of the
    * right row with the SMALLEST `rightTime >= leftTime` for the same
    * key (left-outer; the mirror of [[asofJoinBackward]] — "next
    * scheduled X after event time"). Same merge shape and scale
    * contract: one key shuffle, per-partition sort, a forward-looking
    * `first(ignoreNulls)` window. Right rows must be unique per
    * (key, time), as in the backward variant. */
  def asofJoinForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == rightKey).toSeq
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct(payloadCols.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType
    val rightType = right.select(rightStruct).schema.head.dataType

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rightType).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"), rightStruct.as("__r"))

    // Sort puts a left row at time t BEFORE the right row at the same
    // t (side desc), so `rightTime >= leftTime` ties count as matches
    // for the forward-looking first(ignoreNulls).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = l.unionByName(r)
      .withColumn("__m", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftOut = left.columns.toSeq.map(c => col(s"__l.$c").as(c))
    val rightOut = payloadCols.map(c => col(s"__m.$c").as(c))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Point-in-interval range join: rows of `points` paired with every
    * row of `ranges` whose half-open interval [startCol, endCol)
    * contains `pointCol` (inner semantics). All three columns must be
    * LONG in the same unit (epoch seconds, micros, plain numbers —
    * caller's choice); `binWidth` is in that unit and should be close
    * to the typical interval length (each interval explodes to
    * ceil(len/binWidth)+1 ≤ 2 bins when binWidth ≥ len).
    *
    * `salts` counters bin-key skew: the bin domain is often narrow
    * (weekly bins over a few years ≈ hundreds of distinct keys), so a
    * plain equi-join on bin underfills the shuffle — measured on the
    * gated query at sf0.1: ONE task did 27 s of the join's CPU while
    * 31 cores idled. Each point additionally carries a deterministic
    * content salt in [0, salts) and each exploded range row is
    * replicated `salts`× , splitting every bin's work `salts` ways at
    * the cost of (tiny) range-side duplication — same contract as
    * [[Skew.saltedJoin]].
    *
    * Column-name collisions between the two inputs are the caller's
    * responsibility (rename before joining).
    */
  def binnedRangeJoin(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, startCol: String, endCol: String,
      binWidth: Long, salts: Int = 8): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(salts > 0, s"salts must be positive: $salts")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val p = points
      .withColumn("__bin", bin(col(pointCol)))
      .withColumn("__salt", pmod(hash(col(pointCol)), lit(salts)))
    // half-open end: the last covered bin is the one holding end-1;
    // empty intervals (end <= start) produce an empty sequence and
    // explode drops the row — correct, they can contain no point
    val r = ranges
      .withColumn("__bin",
        explode(when(col(endCol) > col(startCol),
          sequence(bin(col(startCol)), bin(col(endCol) - 1)))
          .otherwise(array().cast("array<long>"))))
      .withColumn("__salt",
        explode(lit((0 until salts).toArray)))
    p.join(r, Seq("__bin", "__salt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin", "__salt")
  }
}
