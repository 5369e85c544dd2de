package graft

/** [[graft.functions.NgramGenerator]] — the custom UDTF through the
  * LATERAL VIEW surface. */
class NgramGenSpec extends SparkSpec {
  import spark.implicits._

  private def grams(text: String, n: Int): Seq[(Long, String)] = {
    Seq(text).toDF("text").createOrReplaceTempView("ng_t")
    spark.sql(
      s"SELECT g.pos, g.gram FROM ng_t " +
        s"LATERAL VIEW graft_ngrams(text, $n) g AS pos, gram")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
  }

  test("trigrams with positions, duplicates preserved") {
    assert(grams("a b c b c d", 3) == Seq(
      (0L, "a b c"), (1L, "b c b"), (2L, "c b c"), (3L, "b c d")))
  }

  test("n=1 is tokenization; short/empty/whitespace texts emit nothing") {
    assert(grams("  x   y  ", 1) == Seq((0L, "x"), (1L, "y")))
    assert(grams("one two", 3).isEmpty)
    assert(grams("   ", 2).isEmpty)
  }

  test("LATERAL VIEW OUTER keeps rows that generate nothing") {
    Seq((1L, "a b c"), (2L, "a")).toDF("id", "text")
      .createOrReplaceTempView("ng_o")
    val out = spark.sql(
      "SELECT id, g.gram FROM ng_o " +
        "LATERAL VIEW OUTER graft_ngrams(text, 2) g AS pos, gram")
      .as[(Long, Option[String])].collect().toSet
    assert(out == Set((1L, Some("a b")), (1L, Some("b c")),
      (2L, None)))
  }

  test("rejects non-literal and non-positive n at analysis") {
    Seq(("a b", 2)).toDF("text", "n").createOrReplaceTempView("ng_bad")
    intercept[Exception] {
      spark.sql("SELECT g.gram FROM ng_bad " +
        "LATERAL VIEW graft_ngrams(text, n) g AS pos, gram").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT g.gram FROM ng_bad " +
        "LATERAL VIEW graft_ngrams(text, 0) g AS pos, gram").collect()
    }
  }
}
