package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, one session).
  * `local[4, 2]` = 4 threads, 2 task attempts — task retries exist in
  * the test JVM so FaultToleranceSpec can prove retry transparency;
  * production clusters run 4 attempts. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Sessions.builder("local[4, 2]", 4).getOrCreate()

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  def sf(name: String): DataFrame =
    Tables(spark, "/root/testdata/sf0.001", name)
}
