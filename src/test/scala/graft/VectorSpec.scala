package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** Cosine / normalize semantics pinned to the reference:
  * 0-norm → 0.0 (app/main.py:62-63), epsilon 1e-9 (app/main.py:316). */
class VectorSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b").select(cosine(col("a"), col("b"))).head().getDouble(0)

  test("cosine of identical non-zero vectors is 1") {
    assert(math.abs(cos(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(math.abs(cos(Seq(1.0, 0.0), Seq(0.0, 1.0))) < 1e-12)
  }

  test("cosine of opposite vectors is -1") {
    assert(math.abs(cos(Seq(1.0, 1.0), Seq(-1.0, -1.0)) + 1.0) < 1e-12)
  }

  test("zero-norm guard returns 0.0, not NaN (reference app/main.py:62-63)") {
    assert(cos(Seq(0.0, 0.0), Seq(1.0, 2.0)) == 0.0)
    assert(cos(Seq(1.0, 2.0), Seq(0.0, 0.0)) == 0.0)
    assert(cos(Seq(0.0, 0.0), Seq(0.0, 0.0)) == 0.0)
  }

  test("cosine stays in [-1, 1] on seeded random vectors") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)((Seq.fill(16)(rng.nextGaussian()), Seq.fill(16)(rng.nextGaussian())))
    val sims = rows.toDF("a", "b").select(cosine(col("a"), col("b"))).as[Double].collect()
    assert(sims.forall(s => s >= -1.0 - 1e-12 && s <= 1.0 + 1e-12))
  }

  test("l2 normalize: unit norm after, idempotent-within-epsilon, zero vector stays zero") {
    val rows = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0), Seq(1e-12, 0.0))
    val out = rows.toDF("v")
      .select(l2Normalize(col("v")).as("n"))
      .select(l2Norm(col("n")))
      .as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-6)
    assert(out(1) == 0.0)
    // tiny vector: epsilon dominates -> norm << 1 (matches reference's v/(|v|+1e-9))
    assert(out(2) < 1.0)
  }

  test("property: cosine is symmetric and scale-invariant (seeded cases)") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(50) {
      val a = Seq.fill(8)(rng.nextGaussian())
      val b = Seq.fill(8)(rng.nextGaussian())
      (a, b, a.map(_ * 3.5))
    }
    val out = rows.toDF("a", "b", "a3")
      .select(cosine(col("a"), col("b")).as("ab"),
        cosine(col("b"), col("a")).as("ba"),
        cosine(col("a3"), col("b")).as("a3b"))
      .as[(Double, Double, Double)].collect()
    out.foreach { case (ab, ba, a3b) =>
      assert(ab == ba, "symmetry must be exact (same fold order both ways? no - but equal)")
      assert(math.abs(ab - a3b) < 1e-12, "scale invariance")
    }
  }

  test("property: normalize is idempotent within epsilon") {
    val rng = new scala.util.Random(13)
    val rows = Seq.fill(50)(Seq.fill(8)(rng.nextGaussian() * math.pow(10, rng.nextInt(6) - 3)))
    val out = rows.toDF("v")
      .select(l2Normalize(col("v")).as("n1"))
      .select(col("n1"), l2Normalize(col("n1")).as("n2"))
      .as[(Seq[Double], Seq[Double])].collect()
    out.foreach { case (n1, n2) =>
      n1.zip(n2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }

  test("dot product throws on dimension mismatch instead of folding a prefix") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val ex = intercept[Throwable] {
      df.select(dot(col("a"), col("b")).as("d")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("dimension mismatch")),
      s"expected dimension-mismatch error, got: ${messages(ex)}")
  }

  test("hamming distance over bit arrays") {
    val d = Seq((Seq(1, 0, 1, 1), Seq(1, 1, 0, 1))).toDF("a", "b")
      .select(hammingDistance(col("a"), col("b"))).head().getInt(0)
    assert(d == 2)
  }

  test("rademacher projection: deterministic matrix, JL norm concentration, map-only") {
    val planes = rademacherPlanes(64, 16)
    assert(planes.length == 16 && planes.forall(_.length == 64))
    assert(planes.forall(_.forall(s => s == 1.0 || s == -1.0)))
    // same salt → same matrix; different salt → different matrix
    assert(planes.map(_.toSeq) == rademacherPlanes(64, 16).map(_.toSeq))
    assert(planes.map(_.toSeq) != rademacherPlanes(64, 16, salt = "s2").map(_.toSeq))
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val proj = withRandomProjection(e, "embedding", "proj", planes)
    // E[||proj||²] = ||v||² (Achlioptas): mean ratio concentrates near 1
    val meanRatio = proj
      .withColumn("_n2", dot(col("embedding"), col("embedding")))
      .filter(col("_n2") > 0)
      .select(avg(dot(col("proj"), col("proj")) / col("_n2")))
      .head().getDouble(0)
    assert(meanRatio > 0.75 && meanRatio < 1.25,
      s"projected norms do not concentrate: mean ratio $meanRatio")
    // map-only: planes are literals, projection adds no exchange
    val p = proj.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    intercept[IllegalArgumentException](rademacherPlanes(0, 4))
    intercept[IllegalArgumentException](withRandomProjection(e, "embedding", "p", Seq.empty))
  }
}
