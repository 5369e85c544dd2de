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

  test("dotDec fast path matches the BigDecimal reference on fuzz + boundary inputs") {
    // the round-18 scaled-long fast path must reproduce the reference
    // (shortest-decimal HALF_UP per product, exact sum) bit for bit —
    // including the guard-band fallbacks around .5 picos boundaries
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new java.util.Random(18181818L)
    def check(xs: Array[Double], ys: Array[Double], float: Boolean): Unit = {
      val (a, b) =
        if (float)
          (new GenericArrayData(xs.map(x => x.toFloat.asInstanceOf[Any])),
            new GenericArrayData(ys.map(y => y.toFloat.asInstanceOf[Any])))
        else
          (new GenericArrayData(xs.map(_.asInstanceOf[Any])),
            new GenericArrayData(ys.map(_.asInstanceOf[Any])))
      val fast = VecKernels.dotDec(a, b, float, float)
      val slow = VecKernels.dotDecSlow(a, b, float, float,
        math.min(a.numElements(), b.numElements()))
      assert(fast.toJavaBigDecimal == slow.toJavaBigDecimal,
        s"fast=$fast slow=$slow xs=${xs.toSeq} ys=${ys.toSeq}")
    }
    // embedding-shaped uniforms (the hot-path distribution)
    for (_ <- 1 to 3000) {
      val xs = Array.fill(8)(rnd.nextDouble() * 4.0 - 2.0)
      val ys = Array.fill(8)(rnd.nextDouble() * 4.0 - 2.0)
      check(xs, ys, float = true); check(xs, ys, float = false)
    }
    // wide log-uniform magnitudes (incl. past the fast-path bar)
    for (_ <- 1 to 3000) {
      def logu() = { val m = math.pow(10.0, rnd.nextDouble() * 16 - 10)
        if (rnd.nextBoolean()) m else -m }
      check(Array.fill(4)(logu()), Array.fill(4)(logu()), float = false)
    }
    // adversarial: products engineered onto/near .5 picos boundaries
    for (_ <- 1 to 4000) {
      val m = rnd.nextInt(1 << 20).toLong
      val eps = rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => 1e-16
        case 2 => -1e-16
        case 3 => 1e-13
        case _ => -1e-13
      }
      val p = (m.toDouble + 0.5) * 1e-12 + eps
      check(Array(p, -p), Array(1.0, 1.0), float = false)
    }
    // zeros, negative zero, subnormals
    check(Array(0.0, -0.0, java.lang.Double.MIN_VALUE),
      Array(1.0, 1.0, 1.0), float = false)
  }

  test("vec_quant_i8 matches the composed round/array_max twin bit for bit") {
    val m = array_max(transform($"a", x => abs(x.cast("double"))))
    val slow = transform($"a",
      x => round(x.cast("double") * lit(127.0) / m).cast("byte"))
    val got = vecs.select($"id",
      VecKernels.vecQuantI8($"a").as("fast"), slow.as("slow"))
    assert(got.filter(not($"fast" <=> $"slow")).count() == 0)
  }

  test("vec_quant_i8 roundtrip error is bounded by half a quantization step") {
    // dequant = q * max|x|/127; worst-case error is half a step
    val m = array_max(transform($"embedding", x => abs(x.cast("double"))))
    val err = sf("embeddings").select(
      array_max(transform(
        arrays_zip(VecKernels.vecQuantI8($"embedding").as("q"),
          $"embedding".as("x")),
        p => abs(p.getField("q").cast("double") * m / lit(127.0) -
          p.getField("x").cast("double")))).as("e"),
      (m / lit(254.0)).as("bound"))
    assert(err.filter($"e" > $"bound" + lit(1e-12)).count() == 0)
  }

  test("vec_quant_i8 edges: zero vector, null element, empty, null array") {
    val df = Seq(
      (1L, Some(Seq(Some(0.0), Some(0.0)))),       // all-zero -> zeros
      (2L, Some(Seq(Some(2.0), None, Some(-1.0)))), // null element survives
      (3L, Some(Seq.empty[Option[Double]])),        // empty -> empty
      (4L, None: Option[Seq[Option[Double]]])       // null array -> null
    ).toDF("id", "a")
    val got = df.select($"id", VecKernels.vecQuantI8($"a").as("q"))
      .as[(Long, Option[Seq[Option[Byte]]])].collect().toMap
    assert(got(1L).contains(Seq(Some(0.toByte), Some(0.toByte))))
    assert(got(2L).contains(Seq(Some(127.toByte), None, Some((-64).toByte))))
    assert(got(3L).contains(Seq.empty))
    assert(got(4L).isEmpty)
  }

  test("vec_dot_i8: exact integer dot, null skip, shorter-zip, codegen") {
    val df = Seq(
      (1L, Seq[Byte](127, -128, 3), Seq[Byte](127, -128, 1)),
      (2L, Seq[Byte](1, 2, 3, 4), Seq[Byte](10, 20)))
      .toDF("id", "a", "b")
    val got = df.select($"id", VecKernels.vecDotI8($"a", $"b").as("d"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 127L * 127 + 128L * 128 + 3L)
    assert(got(2L) == 10L + 40L)
    val withNull = Seq((Seq(Some(5.toByte), None), Seq(Some(2.toByte),
      Some(3.toByte)))).toDF("a", "b")
    assert(withNull.select(VecKernels.vecDotI8($"a", $"b"))
      .as[Long].head() == 10L)
    // a local frame constant-folds into the scan; prove codegen on a
    // parquet-backed plan like the quant test does
    val plan = sf("embeddings")
      .select(VecKernels.vecDotI8(VecKernels.vecQuantI8($"embedding"),
        VecKernels.vecQuantI8($"embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_dot_i8"), plan)
  }

  test("vec_quant_i8 runs inside whole-stage codegen and via SQL") {
    val plan = sf("embeddings")
      .select(VecKernels.vecQuantI8($"embedding").as("q"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_quant_i8"), plan)
    sf("embeddings").limit(5).createOrReplaceTempView("vk_emb")
    assert(spark.sql("SELECT vec_quant_i8(embedding) AS q FROM vk_emb")
      .count() == 5)
  }
}
