ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gcsparquetdataflowspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] with decimal-heavy aggregation needs headroom: 8g showed
  // GC-bound 5-20x slowdowns on the bench queries (box has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // The 38 bench queries generate enough Janino classes to keep C2 busy
  // for minutes (161 s of accumulated compile time observed). A
  // deoptimized long-running generated loop then re-runs INTERPRETED
  // while its recompile waits behind that queue — diagnosed (thread
  // dump, round 6) as the rare 30-50x single-task CPU wedge. More
  // compiler threads drain the queue faster; more code cache keeps
  // compiled methods from being flushed under the same pressure.
  "-XX:CICompilerCount=12",
  "-XX:ReservedCodeCacheSize=512m",
  // A/B'd and REJECTED (round 6): -XX:PerMethodRecompilationCutoff=-1
  // -XX:PerBytecodeRecompilationCutoff=-1 (the "never make a
  // deopt-heavy method not-compilable" theory of the single-task
  // wedge). With the cutoffs disabled the wedge got far MORE frequent
  // and severe (doc_dedup_pipeline 104-161 s in 3 of 6 runs vs a
  // 7-8 s warm baseline): a per-row uncommon trap in a generated loop
  // then deopt-recompiles endlessly instead of settling. Keep the
  // default cutoffs; the bench watchdog (kill+relaunch) bounds the
  // residual rare wedge.
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
