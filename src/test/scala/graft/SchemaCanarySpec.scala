package graft

import org.apache.spark.sql.types._

/** Schema-drift canary: asserts the engine-facing dtypes of every
  * driver-generated table AFTER the [[Tables.normalize]] seam.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already flipped physical timestamp encodings once (`timestamp[ns]`
  * -> `timestamp[us]` NTZ in round 8), which turned into 13 scattered
  * analysis exceptions deep inside queries. This spec turns any such
  * regeneration into ONE pointed failure naming the drifted column —
  * the canonical "where do I look" signal. If it fires, the fix
  * belongs in [[Tables.normalize]] (one seam), never in queries. */
class SchemaCanarySpec extends SparkSpec {

  private def dtypes(name: String): Map[String, DataType] =
    sf(name).schema.fields.map(f => f.name -> f.dataType).toMap

  /** No physical encoding may leak past the normalize seam. */
  test("no TIMESTAMP_NTZ or raw-long timestamp survives normalization") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables; f <- sf(t).schema.fields) {
      assert(f.dataType != TimestampNTZType,
        s"$t.${f.name} surfaced as TIMESTAMP_NTZ past Tables.normalize")
      assert(!(f.name == "ts" && f.dataType == LongType),
        s"$t.${f.name} surfaced as raw nanos-long past Tables.normalize")
    }
  }

  test("events: engine-facing schema") {
    val d = dtypes("events")
    assert(d("event_id") == LongType)
    assert(d("ts") == TimestampType,
      s"events.ts must normalize to TIMESTAMP (unix_micros + watermark " +
        s"eligibility); got ${d("ts")}")
    assert(d("user_id") == LongType)
    assert(d("event_type") == StringType)
    assert(d("value") == DoubleType)
    assert(d("props") == StringType)
  }

  /** The `stream_dedup` gate dedups a doubled stream on event_id and
    * compares against a plain batch aggregate of the RAW table — that
    * comparison is only sound while event_id is unique in the source.
    * A driver regeneration that emits duplicate event_ids would fail
    * the gate for a data reason (or mask real dedup semantics); this
    * canary names the real cause first. Same for NULL ts, which the
    * watermark path would silently drop. */
  test("events: event_id unique and ts non-null (stream_dedup gate contract)") {
    val ev = sf("events")
    val n = ev.count()
    assert(ev.select("event_id").distinct().count() == n,
      "events.event_id is no longer unique — stream_dedup's batch oracle " +
        "assumes one row per event_id; re-pin the gate semantics")
    assert(ev.filter("ts IS NULL").count() == 0L,
      "events.ts contains NULLs — watermarked streaming queries would " +
        "drop them while batch oracles keep them")
  }

  /** Several gates rely on cross-engine string semantics that are
    * only guaranteed for ASCII: edit_distance (DuckDB levenshtein
    * counts bytes, Spark codepoints), substring_dedup (substr/length
    * positions), url/text fixtures. The synthetic corpus has always
    * been printable-ASCII; if a regeneration changes that, this
    * canary names the real cause before any gate hash-diverges. */
  test("documents.text stays printable ASCII (string-gate contract)") {
    import org.apache.spark.sql.functions._
    val nonAscii = sf("documents")
      .filter(not(col("text").rlike("^[\\x20-\\x7e\\t\\n\\r]*$")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII text — byte-vs-codepoint " +
        "string gates (edit_distance, substring_dedup) need review")
  }

  test("orders/lineitem: date-like columns normalize to TIMESTAMP") {
    assert(dtypes("orders")("o_orderdate") == TimestampType)
    assert(dtypes("lineitem")("l_shipdate") == TimestampType)
  }

  test("documents/embeddings: corpus schemas") {
    val doc = dtypes("documents")
    assert(doc("doc_id") == LongType)
    assert(doc("text") == StringType)
    assert(doc("lang") == StringType)
    assert(doc("source") == StringType)
    assert(doc("n_chars") == LongType)
    val emb = dtypes("embeddings")
    assert(emb("vec_id") == LongType)
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true))
    assert(emb("label") == IntegerType)
  }

  /** The next likely testdata drift after r8's NTZ flip: a table
    * regenerated as a DIRECTORY of part files instead of one file.
    * [[Tables.apply]] must read both layouts identically. */
  test("Tables reads a directory-shaped table identically") {
    val src = sf("events")
    val dir = "/tmp/graft_canary_dirtable"
    src.repartition(3).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val back = Tables(spark, dir, "events")
    assert(back.count() == src.count())
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.agg(org.apache.spark.sql.functions.sum("event_id"))
      .head.getLong(0) ==
      src.agg(org.apache.spark.sql.functions.sum("event_id"))
        .head.getLong(0))
  }

  /** The normalize seam must also catch frames built from explicit
    * schemas (the streaming path): an NTZ column arriving that way
    * still casts to TIMESTAMP. */
  test("normalize casts an explicit-schema NTZ column to TIMESTAMP") {
    import spark.implicits._
    val ntz = Seq(1L, 2L).toDF("event_id")
      .selectExpr("event_id", "timestamp_ntz '2024-01-02 03:04:05' AS ts")
    assert(ntz.schema("ts").dataType == TimestampNTZType) // precondition
    val out = Tables.normalize(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    // UTC session => the cast is a wall-clock identity
    val us = out.selectExpr("unix_micros(ts)").as[Long].head()
    assert(us == 1704164645000000L)
  }

  /** Streaming watermark eligibility — the exact failure mode of
    * round 8 (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`): a stream built
    * over the real events schema must accept a watermark on `ts`
    * after normalization. */
  test("normalized events stream accepts a watermark on ts") {
    val schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .schema
    val stream = spark.readStream.schema(schema)
      .parquet("/root/testdata/sf0.001/events.parquet")
    val wm = Tables.normalize(stream).withWatermark("ts", "1 hour")
    assert(wm.isStreaming)
    assert(wm.schema("ts").dataType == TimestampType)
  }
}
