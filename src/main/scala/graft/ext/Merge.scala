package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE-INTO semantics as a relational operator: apply a batch of
  * upserts (matched → replace, unmatched → insert) to a snapshot.
  *
  * The reference pipeline is append-only (its idempotency lives in the
  * `$insert_id` dedup downstream, `M/main.py:312-340`); a training-data
  * engine additionally needs the table-maintenance half — folding a CDC
  * batch into the previous snapshot when re-crawls update documents in
  * place. This is that operator, expressed as the one plan shape that
  * scales: a single co-partitioned full-outer hash join on the key, no
  * window, no driver state. With both sides bucketed by the key (see
  * `sources.Bucketing`) the exchange disappears entirely; otherwise it
  * is one shuffle of each side — at 100 TB the snapshot shuffle is the
  * floor any MERGE implementation pays without storage-level clustering.
  *
  * Deletes are upserts with a tombstone column; filter after merge.
  */
object Merge {

  /** Apply `updates` to `base`: rows sharing `key` take the update's
    * values, update-only keys insert, base-only keys pass through.
    * Both frames must have the same schema (key + payload columns).
    * `updates` must be key-unique (one winner per key — collapse a
    * multi-version batch with [[Corpus.latestByKey]] first); key
    * uniqueness in `base` is the usual snapshot invariant. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key)
    require(updates.columns.sorted.sameElements(base.columns.sorted),
      s"schema mismatch: base ${base.columns.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")}")
    // rename payloads to the update side and carry a copy of the update
    // key: it disambiguates "update row whose payload is genuinely NULL"
    // from "no update for this key" after the full-outer join
    val u = payload.foldLeft(updates) { (df, c) =>
      df.withColumnRenamed(c, s"__u_$c")
    }.withColumn(s"__u_$key", col(key))
    val cols: Seq[Column] = col(key) +: payload.map { c =>
      when(col(s"__u_$key").isNotNull, col(s"__u_$c"))
        .otherwise(col(c)).as(c)
    }
    base.join(u, Seq(key), "full_outer").select(cols: _*)
  }
}
