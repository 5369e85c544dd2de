package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF rung — the last cell of the
  * SURVEY §2.10 surface next to the scalar expression families, the
  * typed Aggregator, and the TypedImperativeAggregate): one input row
  * → many output rows through a native Catalyst [[Generator]], so the
  * explode runs inside the engine's `Generate` operator with column
  * pruning and the outer/position machinery intact — not a collect-
  * explode and not an interpreted HOF chain in the hot path.
  *
  * `graft_ngrams(text, n)` emits (pos, gram) for every word n-gram of
  * the whitespace tokenization — positions 0-based over the token
  * sequence. The tokenization is EXACTLY [[TextFunctions.tokens]]'
  * `split(trim(text), "\\s+")`, so the generator's output algebra is
  * the same one every shingle-based oracle in the suite reproduces.
  * `n` must be a foldable positive literal — generators pin their
  * output schema at plan time. */
case class NgramGenerator(child: Expression, nExpr: Expression)
    extends Generator with UnaryLike[Expression] {

  // the generator contract only exposes one child slot via UnaryLike;
  // n rides as a plan-time literal
  private lazy val n: Int = nExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_ngrams n must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_ngrams expects a string column, got ${child.dataType.sql}")
    else if (!nExpr.foldable || nExpr.dataType != IntegerType &&
        nExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        "graft_ngrams expects a foldable integer n")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure("graft_ngrams needs n >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].toString.trim
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Iterator.empty
    (0 to toks.length - n).iterator.map { i =>
      InternalRow(i.toLong,
        UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
    }
  }

  override def prettyName: String = "graft_ngrams"

  // route GenerateExec through the eval path; explode-style codegen
  // is an optional optimization Spark only implements for its
  // CollectionGenerators
  override def supportCodegen: Boolean = false

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    throw new UnsupportedOperationException(
      s"$prettyName does not implement codegen; Generate evaluates it")

  override protected def withNewChildInternal(newChild: Expression)
      : NgramGenerator = copy(child = newChild)
}

object NgramGen {
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NgramGenerator].getName, "graft_ngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_ngrams takes (text, n), got ${children.size} args")
        NgramGenerator(children.head, children(1))
      }))
}
