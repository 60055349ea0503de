package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense-vector scalar functions as pure Catalyst column expressions.
  *
  * Everything here stays inside whole-stage codegen (no UDFs): `zip_with`,
  * `aggregate`, `transform` lower to codegen'd higher-order functions, so a
  * cosine scan over 100 TB of embeddings is a single embarrassingly-parallel
  * projection — no shuffle, no serialization boundary.
  *
  * Semantics pinned by the reference:
  *  - cosine(a,b) = dot/(|a||b|), 0.0 if either norm is 0 (app/main.py:59-64)
  *  - l2normalize(v) = v / (|v| + 1e-9)                    (app/main.py:315-316)
  *
  * All arithmetic is promoted to Double before accumulation: float32 partial
  * sums would diverge between engines (and between partitionings); doubles
  * folded left in array order are bitwise-deterministic.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Left-fold dot product in array order — deterministic across runs.
    * Backed by the codegen'd [[DotProduct]] expression; bitwise equal to
    * the composable aggregate(zip_with(...)) form.
    *
    * No cast is inserted (optimization r18): [[DotProduct]] reads
    * array<float> in place with exact per-element widening, so parquet
    * float32 embeddings no longer pay a fresh array<double> allocation
    * per dot — which on similarity-join conditions was per candidate
    * PAIR. Same for int8 SQ codes (r19): byte/short/int widen to double
    * exactly, so the quantized tier scans its 1-byte codes in place.
    * Inputs must already be array<float|double|byte|short|int>;
    * anything else (including array<long>, whose widening is inexact)
    * fails analysis loudly. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(DotProduct(expression(a), expression(b)))
  }

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with the reference's zero-norm guard (0.0, not NaN). */
  def cosine(a: Column, b: Column): Column =
    cosineGiven(a, b, l2Norm(a), l2Norm(b))

  /** Cosine with precomputed norms. Pair-scoring operators materialize
    * each side's norm once (a column) instead of recomputing the O(d)
    * norm per candidate pair — same doubles, ~3× less array work. */
  def cosineGiven(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === lit(0.0) || nb === lit(0.0), lit(0.0)).otherwise(dot(a, b) / (na * nb))

  /** Normalize against a precomputed norm column (norm is loop-invariant;
    * passing it in keeps the transform O(d) instead of O(d²) per row). */
  def l2NormalizeWith(v: Column, norm: Column): Column =
    transform(asDouble(v), x => x / (norm + lit(1e-9)))

  /** One-shot convenience; prefer [[withL2Normalized]] on the hot path. */
  def l2Normalize(v: Column): Column = l2NormalizeWith(v, l2Norm(v))

  /** DataFrame-level normalize that materializes the norm once per row. */
  def withL2Normalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("_l2norm", l2Norm(col(vecCol)))
      .withColumn(outCol, l2NormalizeWith(col(vecCol), col("_l2norm")))
      .drop("_l2norm")

  /** Round a derived double for cross-engine comparison. Derived ratios of
    * small integers can land exactly on a decimal rounding tie (e.g.
    * 0.5186875), where Spark (HALF_UP on the shortest decimal repr) and
    * other engines (nearest on the exact binary value) disagree; a fixed
    * sub-1e-8 nudge moves ties off the boundary identically everywhere
    * while leaving all non-tie values untouched at 6 decimals. */
  val RoundNudge = 1.2345e-9
  def stableRound(c: Column, scale: Int = 6): Column = round(c + lit(RoundNudge), scale)

  /** Dense vector from a sparse (int -> double) bucket map — codegen'd,
    * O(dim + nnz); null map yields the zero vector. */
  def denseFromMap(m: Column, dim: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(DenseFromMap(expression(m), dim))
  }

  /** Hamming distance between two equal-length bit arrays (ints 0/1). */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x =!= y, 1).otherwise(0)), lit(0), (s, x) => s + x)

  /** Deterministic Rademacher (±1) projection planes — the Achlioptas
    * form of a Johnson-Lindenstrauss random projection, with the RNG
    * replaced by the engine's md5-sign discipline (entry (i,j) takes the
    * sign of md5("salt" + "i_j")'s third hex digit, exactly
    * [[TextFunctions]]' md5Sign / the oracle's dMd5Sign) so the matrix
    * is reproducible across engines and SQL-replayable. */
  def rademacherPlanes(fromDim: Int, toDim: Int, salt: String = ""): Seq[Array[Double]] = {
    require(fromDim > 0 && toDim > 0,
      s"rademacherPlanes: dims must be positive, got $fromDim -> $toDim")
    (0 until toDim).map { i =>
      Array.tabulate(fromDim) { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$salt${i}_$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (Character.digit(hex.charAt(2), 16) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** Project `vecCol` (fromDim) onto `planes.length` dims: out_i =
    * dot(v, plane_i) / √k. Planes ride as broadcast literals, each
    * component is the codegen'd [[DotProduct]] — map-only, no shuffle;
    * at 100 TB a 64→16 cut shrinks every downstream ANN/dedup scan 4×
    * while JL-preserving pairwise geometry in expectation. */
  def withRandomProjection(df: DataFrame, vecCol: String, outCol: String,
                           planes: Seq[Array[Double]]): DataFrame = {
    require(planes.nonEmpty, "withRandomProjection: needs at least one plane")
    val scale = lit(math.sqrt(planes.length.toDouble))
    df.withColumn(outCol,
      array(planes.map(p => dot(col(vecCol), lit(p)) / scale): _*))
  }
}
