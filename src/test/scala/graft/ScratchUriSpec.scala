package graft

import java.nio.file.Files

/** `spark.graft.scratch.uri` ([[Tables.scratchDir]]): when set, every
  * scratch allocation lands under that URI (the cluster deployment's
  * shared-FS seam); when unset, the driver-local temp default. The
  * conf is runtime-settable, so one suite can prove both modes. */
class ScratchUriSpec extends SparkSpec {
  import spark.implicits._

  test("non-default scratch URI round-trips a persisted frame") {
    val base = Files.createTempDirectory("graft_scratch_base").toString
    spark.conf.set("spark.graft.scratch.uri", s"file:$base")
    try {
      val dir = Tables.scratchDir("spec_store")
      assert(dir.contains(base),
        s"scratch dir $dir must live under the configured URI $base")
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/frame")
      val back = spark.read.parquet(s"$dir/frame")
        .as[(Long, String)].collect().sorted
      assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
    } finally spark.conf.unset("spark.graft.scratch.uri")
  }

  test("unset conf keeps the driver-local temp default") {
    val dir = Tables.scratchDir("spec_default")
    assert(new java.io.File(dir).isDirectory)
  }
}
