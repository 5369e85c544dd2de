package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality signals, language-ID heuristics, document
  * fingerprints. All pure built-in `Column` composition — codegen'd,
  * no UDFs, no shuffles; each is a per-row map that scales linearly
  * and pushes down column pruning to the scan.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-unit count: alnum runs + single punctuation marks
    * (a cheap, deterministic stand-in for a real tokenizer's count). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Fraction of non-space characters that are punctuation. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    when(nonSpace > 0, punct.cast("double") / nonSpace.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Default stopword list for quality scoring (English function words). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => lower(t).isin(stopwords: _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean token length. */
  def avgTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length saturation + structural
    * ratios, the standard cheap pre-filter for LLM training corpora. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(20.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 2.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * 0.5 + punctPenalty * 0.3 + stopScore * 0.2, 6)
  }

  /** Marker-token lists for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  /** Marker-hit count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => lower(t).isin(markers: _*)))

  /** Heuristic language ID: argmax of marker-hit counts, ties broken by
    * language code order, no hits => "und" (undetermined). */
  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, markers) =>
      (lang, langScore(text, markers))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((lang, score), els) =>
      when(score === best && score > 0, lit(lang)).otherwise(els)
    }
  }

  // ------------------------------------------------ scrubbing / PII

  /** PII patterns, chosen to behave identically under Java regex
    * (Spark) and RE2 (DuckDB): no backreferences, no lookaround,
    * ASCII classes only. Order matters — emails are redacted before
    * phone-ish digit runs so the digits in a local-part aren't eaten
    * first. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d[\\d.-]{6,}\\d"

  /** PII redaction: emails → `<EMAIL>`, IPv4 addresses → `<IP>`,
    * phone-ish digit runs → `<PHONE>`. Pure codegen'd
    * `regexp_replace` chain — per-row, shuffle-free, linear at any
    * scale. The corpus-scrub pass run before text ships to training. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** Count of PII matches a scrub would redact (audit metric). Each
    * stage counts on the PREVIOUS stage's redacted text, so an IP is
    * never double-counted as a phone-ish digit run — the count equals
    * the number of replacement tokens [[redactPii]] emits. */
  def piiCount(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_count(text, lit(EmailPattern)) +
      regexp_count(noEmail, lit(Ipv4Pattern)) +
      regexp_count(noIp, lit(PhonePattern))
  }

  /** Whole-word masking: every occurrence of `word` (word-boundary
    * delimited) → `<MASK>` — the targeted-token scrub (stop tokens,
    * eval markers, canary strings). `word` must be a regex-literal
    * token (alphanumeric). */
  def maskWord(text: Column, word: String): Column = {
    require(word.matches("[A-Za-z0-9]+"), "maskWord takes a plain token")
    regexp_replace(text, "\\b" + word + "\\b", "<MASK>")
  }

  /** Exact document fingerprint (content hash). */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonical fingerprint: hash of the sorted distinct token set —
    * catches reorderings/duplications that byte-hashing misses
    * (rolling-hash-style normalization). */
  def canonicalFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Portable 32-bit hash: leading 8 hex digits of md5 as a long.
    * Identical in DuckDB: `('0x' || substr(md5(x),1,8))::BIGINT` —
    * the cross-engine hash primitive for minhash/simhash/LSH oracles. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Second independent 32-bit hash word: hex digits 9-16 of the same
    * md5. Paired with [[hash32]] it yields 64 portable hash bits per
    * value for one md5 evaluation (the 64-bit SimHash sketch).
    * DuckDB twin: `('0x' || substr(md5(x),9,8))::BIGINT`. */
  def hash32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** Driver-side twin of [[hash32]] for deriving plan-time constants
    * (hyperplane weights, minhash coefficients) that oracle SQL can
    * reproduce. */
  def hash32Local(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }
}
