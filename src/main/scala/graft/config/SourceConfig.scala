package graft.config

/** Config model for the pipeline's "query language".
  *
  * Shape mirrors the reference's source-config JSON
  * (`M/sources.json:2-14`, fields read in `M/main.py:184-224`; `M/` =
  * `/root/reference/PycharmProjects/mixpanel_dataflow_importer/`).
  * One [[SourceConfig]] describes how files under one GCS prefix are
  * projected into analytics events.
  */
final case class FieldMapping(
    sourceField: String,
    targetField: String,
    castType: CastType = CastType.Passthrough,
    isRequiredInSource: Boolean = false,
    includeIfNone: Boolean = false) {
  def isWildcard: Boolean = sourceField == "*"
}

/** The complete cast vocabulary of the reference (`M/main.py:224-265`). */
sealed trait CastType
object CastType {
  case object StringT extends CastType
  case object IntegerT extends CastType
  case object FloatT extends CastType
  /** `"true"/"1"/"t"/"y"/"yes"` (lowercased) => true, any other string
    * => false; non-strings use Python-style truthiness
    * (`M/main.py:241-253`). */
  case object BooleanTruthy extends CastType
  /** datetime => epoch seconds; int/float => passthrough as long; string
    * => lenient multi-format parse assuming UTC; unparseable => null,
    * except target `time` falls back to now (`M/main.py:131-149,254-259`). */
  case object UnixTimestampAuto extends CastType
  /** string cast, null => fresh uuid; only honored when the target is
    * `$insert_id` (`M/main.py:260-263`). */
  case object StringOrUuid extends CastType
  case object Passthrough extends CastType

  def parse(s: String): CastType = s match {
    case "string"              => StringT
    case "integer"             => IntegerT
    case "float"               => FloatT
    case "boolean"             => BooleanTruthy
    case "unix_timestamp_auto" => UnixTimestampAuto
    case "string_or_uuid"      => StringOrUuid
    case _                     => Passthrough
  }
}

final case class SourceConfig(
    configId: String,
    sourcePrefix: String,
    fileType: String = "PARQUET",
    eventNameField: Option[String] = None,
    staticEventName: Option[String] = None,
    fieldMappings: Seq[FieldMapping] = Nil) {
  def hasWildcard: Boolean = fieldMappings.exists(_.isWildcard)
  def isParquet: Boolean = fileType.toUpperCase == "PARQUET"
  /** Static fallback event name (`M/main.py:194-195`). */
  def resolvedStaticName: String = staticEventName.getOrElse("generic_event")
}

object ConfigLoader {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper()

  /** Parse a JSON array of source configs (the `sources.json` shape). */
  def parse(json: String): Seq[SourceConfig] = {
    val root = mapper.readTree(json)
    require(root.isArray, "source config file must be a JSON array")
    root.elements().asScala.map(parseConfig).toSeq
  }

  def load(path: String): Seq[SourceConfig] =
    parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Validate a config-object URI — `load_json_from_gcs`'s checks
    * (`M/gcs_utils.py:20-31`): the scheme must match and the URI must
    * name both a bucket and an object path. Returns (bucket, object).
    * `scheme` is parameterized so tests (and non-GCS deployments) can
    * validate `file` URIs with identical semantics. */
  def validateUri(uri: String, scheme: String = "gs"): (String, String) = {
    val prefix = s"$scheme://"
    if (uri == null || !uri.startsWith(prefix))
      throw new IllegalArgumentException(
        s"Invalid GCS URI: $uri. Must start with $prefix")
    val parts = uri.stripPrefix(prefix).split("/", 2)
    // gs:// requires a non-empty bucket; file:/// has an empty authority
    val bucketOk = parts(0).nonEmpty || scheme == "file"
    if (parts.length < 2 || !bucketOk || parts(1).isEmpty)
      throw new IllegalArgumentException(
        s"Invalid GCS URI format: $uri. Expected ${prefix}bucket/object_path")
    (parts(0), parts(1))
  }

  /** Load + parse a config URI with existence check — the full
    * `load_json_from_gcs` contract (`M/gcs_utils.py:18-45`): invalid
    * scheme/shape and missing objects throw (the launcher aborts,
    * `M/main.py:433-437`). I/O goes through Hadoop's FileSystem so the
    * same code serves gs:// (with the GCS connector on the cluster
    * classpath) and file:// (tests, local runs). */
  def loadUri(uri: String,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      scheme: String = "gs"): Seq[SourceConfig] = {
    validateUri(uri, scheme)
    val path = new org.apache.hadoop.fs.Path(uri)
    val fs = path.getFileSystem(hadoopConf)
    if (!fs.exists(path))
      throw new java.io.FileNotFoundException(
        s"Configuration file not found at $uri")
    val buf = new Array[Byte](fs.getFileStatus(path).getLen.toInt)
    val in = fs.open(path)
    try in.readFully(buf) finally in.close()
    parse(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
  }

  private def parseConfig(n: JsonNode): SourceConfig = {
    def optText(field: String): Option[String] =
      Option(n.get(field)).filter(!_.isNull).map(_.asText)
    val mappings = Option(n.get("field_mappings")).toSeq
      .flatMap(_.elements().asScala)
      .map { m =>
        FieldMapping(
          sourceField = m.get("source_field").asText,
          targetField = m.get("mixpanel_field").asText,
          castType = Option(m.get("type")).map(t => CastType.parse(t.asText))
            .getOrElse(CastType.Passthrough),
          isRequiredInSource =
            Option(m.get("is_required_in_source")).exists(_.asBoolean(false)),
          includeIfNone =
            Option(m.get("include_if_none")).exists(_.asBoolean(false)))
      }
    SourceConfig(
      configId = n.get("config_id").asText,
      sourcePrefix = optText("source_gcs_prefix").getOrElse(""),
      fileType = optText("file_type").getOrElse("PARQUET"),
      eventNameField = optText("mixpanel_event_name_from_field"),
      staticEventName = optText("mixpanel_event_name"),
      fieldMappings = mappings)
  }
}
