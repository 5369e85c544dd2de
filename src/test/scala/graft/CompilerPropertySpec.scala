package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.compile.ConfigCompiler
import graft.config.{CastType, FieldMapping, SourceConfig}

/** Property-based invariants of the compiled mapping (SURVEY.md §5.3):
  * random rows x random configs must always satisfy the reference's
  * structural guarantees (`M/main.py:270-284`):
  *   - the output JSON never contains a null property (`_strip_none`);
  *   - every event carries `time` and `$insert_id`;
  *   - ok + DLQ partition the input (no row lost, none duplicated);
  *   - mapped source fields never leak through the wildcard.
  * Raw ScalaCheck Gens sampled from fixed seeds (the scalatest bridge
  * artifact isn't on the offline classpath; seeding also makes any
  * failure exactly reproducible).
  */
class CompilerPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  private val opts = ConfigCompiler.Options()

  private val rowGen: Gen[(String, Option[Long], Option[String], Double)] =
    for {
      name <- Gen.oneOf("click", "view", "", "0", "x y")
      ts <- Gen.option(Gen.choose(0L, 2000000000L))
      uid <- Gen.option(Gen.oneOf("u1", "", "u-long-id"))
      v <- Gen.oneOf(1.5, -3.0, 0.0, Double.NaN)
    } yield (name, ts, uid, v)

  private val castGen: Gen[CastType] = Gen.oneOf(
    CastType.StringT, CastType.IntegerT, CastType.FloatT,
    CastType.BooleanTruthy, CastType.UnixTimestampAuto,
    CastType.Passthrough)

  private val cfgGen: Gen[SourceConfig] = for {
    dynamic <- Gen.oneOf(true, false)
    wildcard <- Gen.oneOf(true, false)
    uidRequired <- Gen.oneOf(true, false)
    vCast <- castGen
  } yield SourceConfig(
    configId = "prop",
    sourcePrefix = "gs://p/",
    eventNameField = if (dynamic) Some("name") else None,
    staticEventName = if (dynamic) None else Some("static_e"),
    fieldMappings = Seq(
      FieldMapping("ts", "time", CastType.UnixTimestampAuto),
      FieldMapping("uid", "$user_id", CastType.StringT,
        isRequiredInSource = uidRequired),
      FieldMapping("v", "val", vCast)) ++
      (if (wildcard) Seq(FieldMapping("*", "*")) else Nil))

  test("compiled mapping invariants hold for random rows x configs") {
    for (seed <- 1L to 15L) {
      val rows = sample(Gen.listOfN(12, rowGen), seed)
      val cfg = sample(cfgGen, seed * 31 + 7)
      val df = rows.map { case (n, ts, uid, v) =>
        (n, ts.map(Long.box).orNull, uid.orNull, v)
      }.toDF("name", "ts", "uid", "v")
      val c = ConfigCompiler.compile(cfg, df, opts)
      val okJson = c.json.as[String].collect()
      val nOk = c.ok.count()
      val nDlq = c.dlq.count()
      // ok + DLQ partition the input
      assert(nOk + nDlq == rows.size, s"seed=$seed")
      // JSON invariants: no nulls survive; time + $insert_id present
      okJson.foreach { j =>
        assert(!j.contains(":null"), s"seed=$seed $j")
        assert(j.contains("\"time\":"), s"seed=$seed $j")
        assert(j.contains("\"$insert_id\":"), s"seed=$seed $j")
      }
      // wildcard never re-emits a mapped source field as a property
      if (cfg.hasWildcard) {
        val props = c.ok.select("properties.*").columns.toSet
        assert(!props.contains("ts") && !props.contains("uid") &&
          !props.contains("v"), s"seed=$seed")
      }
    }
  }
}
