package graft

import java.nio.file.Files

import graft.config.ConfigLoader

/** S7 launch surface: URI validation, existence check, abort-on-load
  * semantics (`M/gcs_utils.py:18-45`, `M/main.py:26-34,430-437`). */
class LauncherSpec extends SparkSpec {

  private val goodJson =
    """[{"config_id": "c1", "source_gcs_prefix": "gs://b/p/",
      |  "file_type": "PARQUET", "mixpanel_event_name": "e",
      |  "field_mappings": [
      |    {"source_field": "a", "mixpanel_field": "b", "type": "string"}]}]
      |""".stripMargin

  test("validateUri: scheme and bucket/object shape enforced") {
    assert(ConfigLoader.validateUri("gs://bucket/path/x.json") ==
      ("bucket", "path/x.json"))
    intercept[IllegalArgumentException] {
      ConfigLoader.validateUri("s3://bucket/x.json")
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.validateUri("gs://bucketonly")
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.validateUri("gs://bucket/")
    }
    intercept[IllegalArgumentException] { ConfigLoader.validateUri(null) }
    // scheme is parameterized: file URIs validate for local runs
    // (empty authority is legal for file://)
    assert(ConfigLoader.validateUri("file:///tmp/x.json", "file") ==
      ("", "tmp/x.json"))
  }

  test("loadUri: valid file loads, missing file and bad JSON throw") {
    val dir = Files.createTempDirectory("graft_launcher")
    val good = dir.resolve("good.json")
    Files.writeString(good, goodJson)
    val conf = spark.sparkContext.hadoopConfiguration

    val cfgs = ConfigLoader.loadUri(s"file://$good", conf, scheme = "file")
    assert(cfgs.map(_.configId) == Seq("c1"))

    intercept[java.io.FileNotFoundException] {
      ConfigLoader.loadUri(s"file://$dir/nope.json", conf, scheme = "file")
    }

    val bad = dir.resolve("bad.json")
    Files.writeString(bad, "{not json]")
    intercept[Exception] {
      ConfigLoader.loadUri(s"file://$bad", conf, scheme = "file")
    }

    intercept[IllegalArgumentException] {
      ConfigLoader.loadUri("gs://b/x.json", conf, scheme = "file")
    }
  }

  test("launcher aborts (Left) on any config-load failure") {
    val a = Launcher.parseArgs(Seq(
      "--mode", "batch",
      "--input_gcs_pattern", "/tmp/none/*.parquet",
      "--source_configs_gcs_uri", "file:///tmp/definitely/missing.json",
      "--config_uri_scheme", "file"))
    assert(Launcher.loadConfigsOrAbort(spark, a).isLeft)

    val dir = Files.createTempDirectory("graft_launcher2")
    val good = dir.resolve("good.json")
    Files.writeString(good, goodJson)
    val ok = Launcher.parseArgs(Seq(
      "--mode", "batch",
      "--input_gcs_pattern", "/tmp/none/*.parquet",
      "--source_configs_gcs_uri", s"file://$good",
      "--config_uri_scheme", "file"))
    val loaded = Launcher.loadConfigsOrAbort(spark, ok)
    assert(loaded.isRight && loaded.toOption.get.head.configId == "c1")
  }

  test("parseArgs: required args and unknown flags rejected") {
    intercept[IllegalArgumentException] {
      Launcher.parseArgs(Seq("--mode", "batch")) // no config uri
    }
    intercept[IllegalArgumentException] {
      Launcher.parseArgs(Seq("--bogus", "x"))
    }
    val a = Launcher.parseArgs(Seq(
      "--source_configs_gcs_uri", "gs://b/c.json",
      "--mixpanel_project_token", "tok",
      "--dlq_topic_api_errors", "gs://b/dlq"))
    assert(a.mode == "batch" && a.mixpanelProjectToken == "tok" &&
      a.dlqTopicApiErrors.contains("gs://b/dlq"))
  }
}
