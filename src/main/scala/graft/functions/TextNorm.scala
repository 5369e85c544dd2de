package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization kernels for corpus preparation.
  *
  * A web-scale training corpus mixes precomposed (NFC) and decomposed
  * (NFD) encodings of the same visible text — "café" has two byte
  * representations that hash, dedup, shingle and tokenize differently
  * unless canonicalized first. Spark ships no normalization function,
  * so every pipeline pays a per-row UDF tax for what is a static
  * JDK-library call; these expressions put the two canonicalization
  * primitives behind whole-stage codegen instead:
  *
  *  - `utf8_nfc(s)`: canonical composition (Unicode NFC), the
  *    canonical form every downstream hash/dedup/fingerprint operator
  *    here assumes.
  *  - `strip_accents(s)`: NFD-decompose, drop combining marks
  *    (categories Mn/Mc/Me, mirroring utf8proc's STRIPMARK as used by
  *    DuckDB's `strip_accents`), recompose to NFC — the accent-folding
  *    step of match keys and search normalization. Characters without
  *    a canonical decomposition (ø, ß, đ) pass through unchanged on
  *    both engines.
  *
  * Both are pure per-row scalar work: no shuffle impact, fully
  * pipelined inside whole-stage codegen, and an ASCII fast path skips
  * the JDK normalizer entirely (returns the input UTF8String without
  * copying) — on a mostly-ASCII corpus the common case costs one byte
  * scan. Both functions agree byte-for-byte with DuckDB's
  * `nfc_normalize`/`strip_accents` on canonically-decomposable text,
  * which is what lets [[graft.queries.CorpusQueries]] hash-gate them.
  */
object TextNorm {

  private def allAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** NFC canonical composition; ASCII input returned as-is.
    * Called from generated code — keep the signature JVM-simple. */
  def nfc(s: UTF8String): UTF8String = {
    if (allAscii(s.getBytes)) return s
    UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))
  }

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** NFD-decompose, drop Mn/Mc/Me marks, NFC-recompose; ASCII input
    * returned as-is. Called from generated code. */
  def stripAccents(s: UTF8String): UTF8String = {
    if (allAscii(s.getBytes)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (!isMark(cp)) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  /** Column form of [[Utf8Nfc]] (requires [[register]]ed session). */
  def utf8Nfc(c: Column): Column = call_function("utf8_nfc", c)

  /** Column form of [[StripAccents]] (requires [[register]]ed session). */
  def stripAccentsCol(c: Column): Column = call_function("strip_accents", c)

  /** SparkSessionExtensions hook: `utf8_nfc(string) -> string`,
    * `strip_accents(string) -> string`. */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("utf8_nfc"),
      new ExpressionInfo(classOf[Utf8Nfc].getName, "utf8_nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"utf8_nfc takes 1 arg, got ${children.size}")
        Utf8Nfc(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"strip_accents takes 1 arg, got ${children.size}")
        StripAccents(children.head)
      }))
  }
}

/** Codegen'd string-type unary expression delegating to a static
  * kernel — shared shape of the two normalization functions. */
abstract class TextNormExpression extends UnaryExpression {
  protected def kernel: String

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def dataType: DataType = child.dataType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.$kernel($c)")
}

/** Unicode NFC canonicalization — see [[TextNorm]]. */
case class Utf8Nfc(child: Expression) extends TextNormExpression {
  override def prettyName: String = "utf8_nfc"
  override protected def kernel: String = "nfc"
  override protected def nullSafeEval(s: Any): Any =
    TextNorm.nfc(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Utf8Nfc =
    copy(child = newChild)
}

/** Accent folding (decompose, strip marks, recompose) — see
  * [[TextNorm]]. */
case class StripAccents(child: Expression) extends TextNormExpression {
  override def prettyName: String = "strip_accents"
  override protected def kernel: String = "stripAccents"
  override protected def nullSafeEval(s: Any): Any =
    TextNorm.stripAccents(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
