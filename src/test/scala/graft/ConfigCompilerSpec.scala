package graft

import org.apache.spark.sql.functions._

import graft.compile.ConfigCompiler
import graft.config.{CastType, FieldMapping, SourceConfig}

/** P5 `MapToMixpanelEvent` semantics (`M/main.py:84-293`). */
class ConfigCompilerSpec extends SparkSpec {
  import spark.implicits._

  private val opts = ConfigCompiler.Options(
    deterministic = true, fixedClockEpoch = 1700000000L, token = "tok")

  private def df = Seq(
    // (name, uid, did, iid, ts, v)
    ("click", "u1", "d1", "i1", 1600000000L, 1.5),
    (null: String, "u2", "d2", "i2", 1600000001L, 2.5),
    ("view", null: String, "d3", null: String, 1600000002L, Double.NaN))
    .toDF("name", "uid", "did", "iid", "ts", "v")

  private val cfg = SourceConfig(
    configId = "t", sourcePrefix = "gs://x/",
    eventNameField = Some("name"),
    fieldMappings = Seq(
      FieldMapping("ts", "time", CastType.UnixTimestampAuto),
      FieldMapping("uid", "$user_id", CastType.StringT),
      FieldMapping("iid", "$insert_id", CastType.StringOrUuid),
      FieldMapping("v", "val", CastType.FloatT),
      FieldMapping("*", "*")))

  test("dynamic event name; missing name rows go to DLQ") {
    val c = ConfigCompiler.compile(cfg, df, opts)
    assert(c.ok.select("event").as[String].collect().toSet == Set("click", "view"))
    val dlq = c.dlq.collect()
    assert(dlq.length == 1 &&
      dlq(0).getAs[String]("error_type") == "missing_dynamic_event_name")
  }

  test("string_or_uuid falls back to a deterministic surrogate") {
    val ok = ConfigCompiler.compile(cfg, df, opts).ok
      .select(col("properties.`$insert_id`")).as[String].collect()
    assert(ok.contains("i1"))
    assert(ok.forall(_ != null)) // null iid replaced by surrogate
  }

  test("wildcard passes unmapped columns; mapped sources excluded") {
    val props = ConfigCompiler.compile(cfg, df, opts).ok.select("properties.*")
    val names = props.columns.toSet
    assert(names.contains("name") && names.contains("did")) // unmapped
    assert(!names.contains("uid") && !names.contains("ts")) // mapped away
    assert(names.contains("token"))
  }

  test("NaN value scrubbed and stripped from JSON output") {
    val json = ConfigCompiler.compile(cfg, df, opts).json
      .as[String].collect().find(_.contains("\"view\"")).get
    assert(!json.contains("\"val\"")) // NaN -> null -> stripped
    assert(!json.contains("null"))
  }

  test("required field miss dead-letters the row (first mapping wins)") {
    val c = SourceConfig(configId = "r", sourcePrefix = "gs://x/",
      staticEventName = Some("e"),
      fieldMappings = Seq(
        FieldMapping("uid", "$user_id", CastType.StringT,
          isRequiredInSource = true),
        FieldMapping("iid", "$insert_id", CastType.StringT,
          isRequiredInSource = true)))
    val dlq = ConfigCompiler.compile(c, df, opts).dlq.collect()
    assert(dlq.length == 1)
    assert(dlq(0).getAs[String]("source_field") == "uid")
  }

  test("static event name defaults to generic_event") {
    val c = SourceConfig(configId = "s", sourcePrefix = "gs://x/")
    val ev = ConfigCompiler.compile(c, df, opts).ok
      .select("event").distinct().as[String].collect()
    assert(ev.toSeq == Seq("generic_event"))
  }

  test("time defaults to clock when unmapped; insert_id surrogate injected") {
    val c = SourceConfig(configId = "d", sourcePrefix = "gs://x/",
      staticEventName = Some("e"),
      fieldMappings = Seq(FieldMapping("uid", "$user_id", CastType.StringT)))
    val row = ConfigCompiler.compile(c, df, opts).ok
      .select(col("properties.time"), col("properties.`$insert_id`"))
      .collect()(0)
    assert(row.getLong(0) == 1700000000L)
    assert(row.getString(1).length == 32) // md5 surrogate
  }

  test("include_if_none keeps the null and suppresses the time default") {
    val d2 = Seq((null.asInstanceOf[java.lang.Long], "a"))
      .toDF("maybe_time", "x")
    val c = SourceConfig(configId = "i", sourcePrefix = "gs://x/",
      staticEventName = Some("e"),
      fieldMappings = Seq(
        FieldMapping("maybe_time", "time", CastType.IntegerT,
          includeIfNone = true)))
    val json = ConfigCompiler.compile(c, d2, opts).json.as[String].collect()(0)
    assert(!json.contains("\"time\"")) // kept-null stripped, no default
    // without include_if_none the default fires
    val c2 = c.copy(fieldMappings = Seq(
      FieldMapping("maybe_time", "time", CastType.IntegerT)))
    val json2 = ConfigCompiler.compile(c2, d2, opts).json.as[String].collect()(0)
    assert(json2.contains("\"time\":1700000000"))
  }
}
