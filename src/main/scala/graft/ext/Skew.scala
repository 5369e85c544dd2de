package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A hot join key sends its whole partition to one reducer; AQE's
  * skew-join split handles the common case automatically, but a
  * pathological key (one tenant = half the data) still benefits from
  * explicit salting: the big side scatters each row into one of
  * `salts` sub-keys, the small side replicates each row to ALL
  * `salts` sub-keys, and the join key becomes (key, salt) — the hot
  * key's rows spread over `salts` reducers at the cost of replicating
  * the small side `salts` times.
  *
  * The salt is derived deterministically from the big side's row
  * content (xxhash64 of all columns mod `salts`), not `rand()` — same
  * result on retry/replay, oracle-checkable, and no RNG in the plan.
  * Join semantics are exactly the plain equi-join's for any join where
  * the replicated side is joined 1:N on the key (dimension joins).
  */
object Skew {

  /** Salt column in [0, salts) from the given columns' content. */
  def saltOf(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Inner equi-join of `big` with `small` on `key`, salted `salts`
    * ways. `small` is replicated `salts` x — keep it the dimension
    * side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigCols = big.columns.map(c => col(s"`$c`"))
    val salted = big.withColumn("_salt", saltOf(salts, bigCols: _*))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
