package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.compile.ConfigCompiler
import graft.config.{CastType, FieldMapping, SourceConfig}
import graft.operators.Router

/** Reference-parity queries: the ETL semantic core (config-compiled
  * mapping, routing theta-join, dedup, DLQ channel) re-expressed as
  * Catalyst plans, each with a DuckDB oracle twin.
  *
  * Determinism notes (SURVEY.md §7.5): every query here runs the
  * compiler in deterministic mode and keys `$insert_id`/`time` off real
  * columns so no uuid()/now() reaches the oracle compare.
  */
object CoreQueries {

  /** The production-shaped config for the synthetic `events` table —
    * dynamic event name + all cast types + wildcard, mirroring the
    * shape of every entry in `M/sources.json:2-14`. */
  val eventsConfig: SourceConfig = SourceConfig(
    configId = "events_cfg",
    sourcePrefix = "gs://bucket/events/",
    eventNameField = Some("event_type"),
    fieldMappings = Seq(
      FieldMapping("ts", "time", CastType.UnixTimestampAuto),
      FieldMapping("user_id", "$user_id", CastType.StringT),
      FieldMapping("event_id", "$insert_id", CastType.StringOrUuid),
      FieldMapping("value", "value_f", CastType.FloatT),
      FieldMapping("*", "*")))

  /** P5 `MapToMixpanelEvent` end-to-end (rename/cast/wildcard/defaults),
    * flattened to typed columns. */
  def mapEvents(spark: SparkSession, dir: String): DataFrame =
    ConfigCompiler.compile(eventsConfig, Tables(spark, dir, "events")).flat

  /** Integer/boolean/string cast table coverage (§1.2): derives string
    * inputs from data, applies the truthy-boolean + integer + float
    * rules. */
  def castRules(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select(
      col("event_id"),
      // strings exercising the truthy set {true,1,t,y,yes} + misses
      when(col("event_type") === "click", lit("yes"))
        .when(col("event_type") === "view", lit("TRUE"))
        .when(col("event_type") === "purchase", lit("1"))
        .when(col("event_type") === "signup", lit("no"))
        .otherwise(lit("whatever")).as("bool_str"),
      concat(col("user_id").cast("string"), lit(".9")).as("num_str"),
      col("value"))
    val cfg = SourceConfig(
      configId = "cast_cfg",
      sourcePrefix = "gs://bucket/cast/",
      staticEventName = Some("cast_event"),
      fieldMappings = Seq(
        FieldMapping("event_id", "$insert_id", CastType.StringT),
        FieldMapping("bool_str", "flag", CastType.BooleanTruthy),
        FieldMapping("num_str", "num_f", CastType.FloatT),
        FieldMapping("num_str", "num_i", CastType.IntegerT),
        FieldMapping("value", "value_i", CastType.IntegerT),
        FieldMapping("event_id", "time", CastType.UnixTimestampAuto)))
    ConfigCompiler.compile(cfg, ev).flat
  }

  /** P2/J2 `RouteFileToConfig`: broadcast prefix theta-join with
    * first-match-wins declaration order. */
  val routeConfigs: Seq[SourceConfig] = Seq(
    SourceConfig("c_src0", "gs://bucket/src0/"),
    SourceConfig("c_src1", "gs://bucket/src1/"),
    SourceConfig("c_src1x", "gs://bucket/src1", fileType = "CSV"),
    SourceConfig("c_all", "gs://bucket/src"))

  def routeFiles(spark: SparkSession, dir: String): DataFrame = {
    val uris = Tables(spark, dir, "documents").select(
      concat(lit("gs://bucket/"), col("source"), lit("/"),
        col("doc_id").cast("string"), lit(".parquet")).as("uri"))
    Router.route(uris, routeConfigs)
  }

  /** Parquet-only routing filter (P3). */
  def routeFilesParquet(spark: SparkSession, dir: String): DataFrame = {
    val uris = Tables(spark, dir, "documents").select(
      concat(lit("gs://bucket/"), col("source"), lit("/"),
        col("doc_id").cast("string"), lit(".parquet")).as("uri"))
    Router.routeParquet(uris, routeConfigs)
  }

  /** A1 `Distinct`: exact dedup of a projected key set. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select("user_id", "event_type").distinct()

  /** DLQ error channel (tagged outputs): required-field misses routed to
    * the transform-error frame, joined back to a stable key. */
  def dlqRequired(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("maybe_user", when(col("value") >= 50.0, col("user_id")))
    val cfg = SourceConfig(
      configId = "dlq_cfg",
      sourcePrefix = "gs://bucket/dlq/",
      staticEventName = Some("e"),
      fieldMappings = Seq(
        FieldMapping("maybe_user", "$user_id", CastType.StringT,
          isRequiredInSource = true),
        FieldMapping("event_id", "$insert_id", CastType.StringT),
        FieldMapping("ts", "time", CastType.UnixTimestampAuto)))
    ConfigCompiler.compile(cfg, ev).dlq
      .withColumn("event_id", get_json_object(col("original_row"), "$.event_id"))
      .drop("original_row")
  }

  /** DLQ REPLAY — the operational half of the dead-letter channel the
    * reference only writes (`M/main.py` tags transform errors; nothing
    * re-drives them): rows dead-lettered under the strict config are
    * reconstructed from the DLQ's `original_row` JSON audit column
    * (the replay contract — the DLQ row is self-contained, no source
    * re-read), re-mapped under a RELAXED config, and accounted as
    * recovered vs still-bad per event type. The still-bad remainder
    * is the DLQ's next generation — exactly how a production backfill
    * drains a dead-letter queue in passes as configs get fixed.
    * Two compile passes over gate-scale frames; at 100 TB the replay
    * reads only the DLQ partition, never the source. */
  def dlqReplay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("maybe_user", when(col("value") >= 50.0, col("user_id")))
    val strict = SourceConfig(
      configId = "dlq_cfg",
      sourcePrefix = "gs://bucket/dlq/",
      staticEventName = Some("e"),
      fieldMappings = Seq(
        FieldMapping("maybe_user", "$user_id", CastType.StringT,
          isRequiredInSource = true),
        FieldMapping("event_id", "$insert_id", CastType.StringT),
        FieldMapping("ts", "time", CastType.UnixTimestampAuto)))
    val restored = ConfigCompiler.compile(strict, ev).dlq
      .select(from_json(col("original_row"), ev.schema).as("r"))
      .select(col("r.*"))
      .withColumn("maybe_user2",
        when(col("value") >= 20.0, col("user_id")))
    val relaxed = strict.copy(configId = "dlq_cfg_fixed",
      fieldMappings = Seq(
        FieldMapping("maybe_user2", "$user_id", CastType.StringT,
          isRequiredInSource = true),
        FieldMapping("event_id", "$insert_id", CastType.StringT),
        FieldMapping("ts", "time", CastType.UnixTimestampAuto)))
    val restoredM = graft.Tables.materialize(restored)
    val nDlq = restoredM.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_dlq"))
    val stillBad = ConfigCompiler.compile(relaxed, restoredM).dlq
      .select(from_json(col("original_row"), restoredM.schema).as("r"))
      .select(col("r.event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_still_bad"))
    nDlq.join(stillBad, Seq("event_type"), "left_outer")
      .select(col("event_type"), col("n_dlq"),
        (col("n_dlq") - coalesce(col("n_still_bad"), lit(0L)))
          .as("n_recovered"),
        coalesce(col("n_still_bad"), lit(0L)).as("n_still_bad"))
  }

  /** A3 router counters as data (`M/main.py:55-63`): matched count per
    * config + the unmatched-URI count. */
  def routeCounters(spark: SparkSession, dir: String): DataFrame = {
    val uris = Tables(spark, dir, "documents").select(
      concat(lit("gs://bucket/"), col("source"), lit("/"),
        col("doc_id").cast("string"), lit(".parquet")).as("uri"))
    Router.routeCounts(uris, routeConfigs)
  }

  /** A3 transform counters as data (`M/main.py:145,274-277`): rows,
    * DLQ'd rows, missing-distinct-id rows, timestamp parse errors —
    * over a frame engineered to exercise all three failure modes
    * (empty distinct ids every 5th row, unparseable timestamp strings
    * every 7th). */
  def mappingCounters(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").select(
      col("event_id"), col("event_type"),
      when(pmod(col("event_id"), lit(7)) === 0, lit("not-a-timestamp"))
        .otherwise(lit("2024-01-02 03:04:05")).as("ts_str"),
      when(pmod(col("event_id"), lit(5)) === 0, lit(""))
        .otherwise(col("user_id").cast("string")).as("uid_str"))
    val cfg = SourceConfig(
      configId = "counters_cfg",
      sourcePrefix = "gs://bucket/counters/",
      eventNameField = Some("event_type"),
      fieldMappings = Seq(
        FieldMapping("ts_str", "time", CastType.UnixTimestampAuto),
        FieldMapping("uid_str", "$user_id", CastType.StringT),
        FieldMapping("event_id", "$insert_id", CastType.StringT)))
    ConfigCompiler.compile(cfg, ev).counters
      .select(lit("counters_cfg").as("config_id"), col("n_rows"),
        col("n_dlq"), col("missing_distinct_id"), col("ts_parse_errors"))
  }

  /** Wire-format check: the JSON event line (nulls stripped) — counted
    * per event name so the oracle stays engine-agnostic. */
  def eventJsonCounts(spark: SparkSession, dir: String): DataFrame = {
    val json = ConfigCompiler.compile(eventsConfig, Tables(spark, dir, "events")).json
    json.select(get_json_object(col("event_json"), "$.event").as("event"))
      .groupBy("event").agg(count(lit(1)).as("n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "map_events" -> mapEvents _,
    "cast_rules" -> castRules _,
    "route_files" -> routeFiles _,
    "route_files_parquet" -> routeFilesParquet _,
    "dedup_exact" -> dedupExact _,
    "dlq_required" -> dlqRequired _,
    "dlq_replay" -> dlqReplay _,
    "event_json_counts" -> eventJsonCounts _,
    "route_counters" -> routeCounters _,
    "mapping_counters" -> mappingCounters _)

  val oracleSql: Map[String, String] = Map(
    // DLQ membership: required-miss iff NOT(value >= threshold) —
    // CASE's ELSE catches SQL NULL exactly like when().otherwise
    "dlq_replay" ->
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN value >= 50.0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_dlq,
        |  CAST(SUM(CASE WHEN value >= 50.0 THEN 0
        |    WHEN value >= 20.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_recovered,
        |  CAST(SUM(CASE WHEN value >= 20.0 THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_still_bad
        |FROM events GROUP BY event_type""".stripMargin,
    "map_events" ->
      """SELECT event_type AS event,
        |       epoch_us(ts) // 1000000 AS "time",
        |       CAST(user_id AS VARCHAR) AS "$user_id",
        |       CAST(event_id AS VARCHAR) AS "$insert_id",
        |       CASE WHEN isnan(value) THEN NULL ELSE value END AS value_f,
        |       event_type AS event_type,
        |       props AS props
        |FROM events
        |WHERE event_type IS NOT NULL AND event_type <> ''""".stripMargin,
    "cast_rules" ->
      """SELECT 'cast_event' AS event,
        |       CAST(event_id AS VARCHAR) AS "$insert_id",
        |       CASE WHEN event_type IN ('click','purchase','view') THEN TRUE ELSE FALSE END AS flag,
        |       CAST(CAST(user_id AS VARCHAR) || '.9' AS DOUBLE) AS num_f,
        |       CAST(NULL AS BIGINT) AS num_i,
        |       CAST(TRUNC(value) AS BIGINT) AS value_i,
        |       event_id AS "time"
        |FROM events""".stripMargin,
    "route_files" ->
      """WITH uris AS (
        |  SELECT 'gs://bucket/' || source || '/' || CAST(doc_id AS VARCHAR) || '.parquet' AS uri
        |  FROM documents),
        |cfg(ordinal, config_id, prefix, file_type) AS (VALUES
        |  (0, 'c_src0',  'gs://bucket/src0/', 'PARQUET'),
        |  (1, 'c_src1',  'gs://bucket/src1/', 'PARQUET'),
        |  (2, 'c_src1x', 'gs://bucket/src1',  'CSV'),
        |  (3, 'c_all',   'gs://bucket/src',   'PARQUET')),
        |m AS (
        |  SELECT uri, min(ordinal) AS o
        |  FROM uris JOIN cfg ON starts_with(uri, prefix)
        |  GROUP BY uri)
        |SELECT m.uri AS uri, cfg.config_id AS config_id, cfg.file_type AS file_type
        |FROM m JOIN cfg ON cfg.ordinal = m.o""".stripMargin,
    "route_files_parquet" ->
      """WITH uris AS (
        |  SELECT 'gs://bucket/' || source || '/' || CAST(doc_id AS VARCHAR) || '.parquet' AS uri
        |  FROM documents),
        |cfg(ordinal, config_id, prefix, file_type) AS (VALUES
        |  (0, 'c_src0',  'gs://bucket/src0/', 'PARQUET'),
        |  (1, 'c_src1',  'gs://bucket/src1/', 'PARQUET'),
        |  (2, 'c_src1x', 'gs://bucket/src1',  'CSV'),
        |  (3, 'c_all',   'gs://bucket/src',   'PARQUET')),
        |m AS (
        |  SELECT uri, min(ordinal) AS o
        |  FROM uris JOIN cfg ON starts_with(uri, prefix)
        |  GROUP BY uri)
        |SELECT m.uri AS uri, cfg.config_id AS config_id
        |FROM m JOIN cfg ON cfg.ordinal = m.o
        |WHERE upper(cfg.file_type) = 'PARQUET'""".stripMargin,
    "dedup_exact" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "dlq_required" ->
      """SELECT 'missing_required_field' AS error_type,
        |       'dlq_cfg' AS config_id,
        |       'maybe_user' AS source_field,
        |       CAST(event_id AS VARCHAR) AS event_id
        |FROM events WHERE NOT (value >= 50.0)""".stripMargin,
    "event_json_counts" ->
      """SELECT event_type AS event, count(*) AS n
        |FROM events
        |WHERE event_type IS NOT NULL AND event_type <> ''
        |GROUP BY event_type""".stripMargin,
    "route_counters" ->
      """WITH uris AS (
        |  SELECT 'gs://bucket/' || source || '/' || CAST(doc_id AS VARCHAR) || '.parquet' AS uri
        |  FROM documents),
        |cfg(ordinal, config_id, prefix) AS (VALUES
        |  (0, 'c_src0',  'gs://bucket/src0/'),
        |  (1, 'c_src1',  'gs://bucket/src1/'),
        |  (2, 'c_src1x', 'gs://bucket/src1'),
        |  (3, 'c_all',   'gs://bucket/src')),
        |m AS (
        |  SELECT uri, min(ordinal) AS o
        |  FROM uris JOIN cfg ON starts_with(uri, prefix)
        |  GROUP BY uri),
        |counts AS (
        |  SELECT cfg.config_id AS config_id, count(*) AS n
        |  FROM m JOIN cfg ON cfg.ordinal = m.o GROUP BY 1),
        |ids AS (SELECT config_id FROM cfg
        |        UNION ALL SELECT '__unmatched__'),
        |unm AS (SELECT (SELECT count(*) FROM uris) - (SELECT count(*) FROM m) AS n)
        |SELECT ids.config_id AS config_id,
        |  CAST(CASE WHEN ids.config_id = '__unmatched__' THEN (SELECT n FROM unm)
        |       ELSE coalesce((SELECT n FROM counts c WHERE c.config_id = ids.config_id), 0)
        |  END AS BIGINT) AS n
        |FROM ids""".stripMargin,
    "mapping_counters" ->
      """SELECT 'counters_cfg' AS config_id,
        |  count(*) AS n_rows,
        |  count(CASE WHEN event_type IS NULL OR event_type = '' THEN 1 END) AS n_dlq,
        |  count(CASE WHEN NOT (event_type IS NULL OR event_type = '')
        |              AND (event_id % 5 = 0 OR user_id IS NULL) THEN 1 END) AS missing_distinct_id,
        |  CAST(coalesce(sum(CASE WHEN NOT (event_type IS NULL OR event_type = '')
        |              AND event_id % 7 = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS ts_parse_errors
        |FROM events""".stripMargin)
}
