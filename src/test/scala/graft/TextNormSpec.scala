package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextNorm

/** Native utf8_nfc / strip_accents expressions: kernel semantics on
  * precomposed, decomposed, non-decomposable and multi-mark input;
  * the ASCII fast path; SQL registration; codegen participation.
  * All non-ASCII is written as \\u escapes so NFC-vs-NFD intent is
  * visible in source: á=á é=é ó=ó (precomposed),
  * ́=combining acute, ̃=combining tilde. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("strip_accents folds precomposed and decomposed forms alike") {
    assert(TextNorm.stripAccents(u("áéîõü çñ"))
      .toString == "aeiou cn")
    // decomposed: base + combining acute
    assert(TextNorm.stripAccents(u("áé")).toString == "ae")
    // multiple marks on one base (acute + tilde)
    assert(TextNorm.stripAccents(u("á̃b")).toString == "ab")
  }

  test("characters without a canonical decomposition pass through") {
    assert(TextNorm.stripAccents(u("ø ß đ")).toString ==
      "ø ß đ")
  }

  test("utf8_nfc composes decomposed input and is identity on NFC") {
    assert(TextNorm.nfc(u("ó")).toString == "ó")
    assert(TextNorm.nfc(u("ó")).numChars() == 1)
    assert(TextNorm.nfc(u("ó")).toString == "ó")
  }

  test("ASCII fast path returns the input object unchanged") {
    val in = u("plain ascii text")
    assert(TextNorm.nfc(in) eq in)
    assert(TextNorm.stripAccents(in) eq in)
  }

  test("both functions are SQL-registered and null-safe") {
    val r = spark.sql(
      "SELECT utf8_nfc('ó') AS n, strip_accents('café') AS s, " +
        "utf8_nfc(CAST(NULL AS STRING)) AS nn, " +
        "strip_accents(CAST(NULL AS STRING)) AS sn")
      .collect().head
    assert(r.getString(0) == "ó")
    assert(r.getString(1) == "cafe")
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("strip_accents runs inside whole-stage codegen") {
    val plan = sf("documents")
      .select(TextNorm.stripAccentsCol($"text").as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [strip_accents"), plan)
  }
}
