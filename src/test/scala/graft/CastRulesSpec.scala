package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CastRules

/** The §1.2 cast table, edge cases the reference encodes
  * (`M/main.py:113-265`). */
class CastRulesSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("NaN scrubs to null (the reference's NULL story for doubles)") {
    val df = Seq(Double.NaN, 1.5).toDF("d")
    val got = df.select(CastRules.scrub($"d", DoubleType).as("v"))
      .collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(None, Some(1.5)))
  }

  test("string cast: NaN -> null, booleans Python-style") {
    val df = Seq((Double.NaN, true), (2.0, false)).toDF("d", "b")
    val got = df.select(
      CastRules.stringCast($"d", DoubleType).as("s"),
      CastRules.stringCast($"b", BooleanType).as("bs")).collect()
    assert(Option(got(0).get(0)).isEmpty && got(0).getString(1) == "True")
    assert(got(1).getString(0) == "2.0" && got(1).getString(1) == "False")
  }

  test("integer cast truncates toward zero and drops unparseable") {
    assert(one(CastRules.integerCast(lit(3.7), DoubleType)) == 3L)
    assert(one(CastRules.integerCast(lit(-3.7), DoubleType)) == -3L)
    assert(one(CastRules.integerCast(lit(" 7 "), StringType)) == 7L)
    assert(one(CastRules.integerCast(lit("1.5"), StringType)) == null)
    assert(one(CastRules.integerCast(lit("abc"), StringType)) == null)
  }

  test("float cast parses numeric strings, drops garbage") {
    assert(one(CastRules.floatCast(lit("1.5e2"), StringType)) == 150.0)
    assert(one(CastRules.floatCast(lit("x"), StringType)) == null)
  }

  test("truthy boolean: the five truthy strings, everything else false") {
    for (s <- Seq("true", "TRUE", "1", "t", "Y", "yes"))
      assert(one(CastRules.truthyBooleanCast(lit(s), StringType)) == true, s)
    for (s <- Seq("no", "false", "0", "whatever", ""))
      assert(one(CastRules.truthyBooleanCast(lit(s), StringType)) == false, s)
    // non-strings: Python truthiness
    assert(one(CastRules.truthyBooleanCast(lit(0.0), DoubleType)) == false)
    assert(one(CastRules.truthyBooleanCast(lit(-2), IntegerType)) == true)
    assert(one(CastRules.truthyBooleanCast(
      lit(null).cast(StringType), StringType)) == null)
  }

  test("unix_timestamp_auto: numeric passthrough, naive strings as UTC") {
    assert(one(CastRules.unixTimestampAuto(lit(1700000123L), LongType))
      == 1700000123L)
    // naive ISO string assumed UTC (session TZ pinned)
    assert(one(CastRules.unixTimestampAuto(
      lit("2023-11-14 22:13:20"), StringType)) == 1700000000L)
    assert(one(CastRules.unixTimestampAuto(
      lit("2023-11-14T22:13:20"), StringType)) == 1700000000L)
    assert(one(CastRules.unixTimestampAuto(lit("2023-11-14"), StringType))
      == 1699920000L)
    assert(one(CastRules.unixTimestampAuto(lit("not a date"), StringType))
      == null)
  }

  test("lenient parse breadth: RFC-2822, dd MMM yyyy, epoch strings") {
    def p(s: String): Any =
      one(CastRules.unixTimestampAuto(lit(s), StringType))
    // RFC-2822 with named zone and numeric offset
    assert(p("Tue, 14 Nov 2023 22:13:20 GMT") == 1700000000L)
    assert(p("Tue, 14 Nov 2023 22:13:20 +0000") == 1700000000L)
    assert(p("Wed, 15 Nov 2023 00:13:20 +0200") == 1700000000L)
    // dateutil-style textual dates (assumed UTC)
    assert(p("14 Nov 2023") == 1699920000L)
    assert(p("14 Nov 2023 22:13:20") == 1700000000L)
    assert(p("Nov 14, 2023") == 1699920000L)
    assert(p("20231114") == 1699920000L)
    // digit-string epochs: 10-digit seconds, 13-digit millis
    assert(p("1700000000") == 1700000000L)
    assert(p("1700000000123") == 1700000000L)
    assert(p(" 1700000000 ") == 1700000000L) // trimmed like dateutil
    // still unparseable
    assert(p("123456") == null)
    assert(p("") == null)
  }
}
