package graft

import org.apache.spark.sql.functions.col

import graft.functions.UrlFunctions

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .as[String].head()

  test("host and scheme lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path/File") ==
      "https://www.example.com/Path/File")
  }

  test("default ports stripped, non-default kept") {
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    // https on :80 is NOT the default — kept
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")
  }

  test("fragment dropped") {
    assert(canon("https://a.com/x#frag?fake=1") == "https://a.com/x")
  }

  test("tracking params stripped, real params and order preserved") {
    assert(canon("https://a.com/x?utm_source=f&id=7&fbclid=z&b=2") ==
      "https://a.com/x?id=7&b=2")
    assert(canon("https://a.com/x?utm_campaign=only") == "https://a.com/x")
    assert(canon("https://a.com/x?gclid=1&ref=h") == "https://a.com/x")
  }

  test("trailing slash stripped; root folds to bare authority") {
    assert(canon("https://a.com/x/") == "https://a.com/x")
    assert(canon("https://a.com/") == "https://a.com")
  }

  test("composed mess canonicalizes to one key") {
    val variants = Seq(
      "HTTPS://A.com:443/p/q/?utm_source=x#top",
      "https://a.com/p/q?gclid=123",
      "https://a.com/p/q/")
    assert(variants.map(canon).distinct == Seq("https://a.com/p/q"))
  }
}
