package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.VecKernels

/** Native vec_dot_dec expression: exactness vs the HOF twin, SQL
  * registration, null/length edge cases, codegen participation. */
class VecKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -0.25f, 2.0f), Array(1.0f, 4.0f, -0.5f)),
    (2L, Array(1e-8f, 2e-8f, -1e-8f), Array(3e-8f, -1e-8f, 2e-8f)),
    (3L, Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f))
  ).toDF("id", "a", "b")

  test("vec_dot_dec matches the exact-decimal HOF fold bit for bit") {
    val got = vecs.select($"id",
      VecKernels.vecDotDec($"a", $"b").as("fast"),
      Similarity.dotExact($"a", $"b").cast("decimal(28,12)").as("slow"))
    assert(got.filter($"fast" =!= $"slow").count() == 0)
  }

  test("vec_dot_dec is registered as a SQL function") {
    vecs.createOrReplaceTempView("vk_vecs")
    val r = spark.sql(
      "SELECT id, CAST(vec_dot_dec(a, b) AS DOUBLE) AS d FROM vk_vecs")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - (0.5 - 1.0 - 1.0)) < 1e-9)
  }

  test("null array yields null; length mismatch zips to the shorter") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0))),          // min-length: 1*3
      (2L, None: Option[Seq[Double]], Some(Seq(1.0, 2.0))) // null side
    ).toDF("id", "a", "b")
    val got = df.select($"id",
      VecKernels.vecDotDec($"a", $"b").cast("double").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(3.0))
    assert(got(2L).isEmpty)
  }

  test("vec_dot_dec runs inside whole-stage codegen") {
    // parquet-backed input: a local relation would be constant-folded
    // away by ConvertToLocalRelation before any codegen happens
    val plan = sf("embeddings")
      .select(VecKernels.vecDotDec($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // '*' prefixes every operator inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [vec_dot_dec"), plan)
  }

  test("empty arrays dot to zero") {
    val df = Seq((1L, Seq.empty[Double], Seq.empty[Double]))
      .toDF("id", "a", "b")
    val got = df.select(VecKernels.vecDotDec($"a", $"b").cast("double"))
      .as[Double].head()
    assert(got == 0.0)
  }
}
