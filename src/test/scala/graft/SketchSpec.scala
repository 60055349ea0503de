package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def toks(rows: (String, String)*) =
    rows.toDF("source", "text")
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))

  private val corpus = toks(
    ("a", "x x x x y y z w w w w w"),
    ("b", "p q r s t u v p p q"))

  // ---------------------------------------------------------------- //
  // Count-min                                                        //
  // ---------------------------------------------------------------- //

  test("cm estimates never undercount, and are exact without collisions") {
    val sk = Sketch.cmSketch(corpus, "tok", depth = 4, width = 256)
    val exact = corpus.groupBy("tok").agg(count(lit(1)).as("exact"))
    val est = Sketch.cmEstimates(sk, exact.select("tok"), "tok", depth = 4, width = 256)
      .join(exact, "tok").as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (tok, cmEst, ex) =>
      assert(cmEst >= ex, s"cm undercounted $tok: $cmEst < $ex")
    }
    // 11 distinct tokens into 4x256 cells: collisions are essentially
    // impossible, so every estimate is exact here.
    est.foreach { case (tok, cmEst, ex) =>
      assert(cmEst == ex, s"unexpected collision on $tok: $cmEst != $ex")
    }
  }

  test("cm grids merge by addition: sketch(a++b) == sketch(a) + sketch(b)") {
    val a = corpus.filter(col("source") === "a")
    val b = corpus.filter(col("source") === "b")
    def grid(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmSketch(df, "tok", depth = 4, width = 64)
        .as[(Int, Long, Long)].collect().map { case (r, bk, c) => (r, bk) -> c }.toMap
    val merged = {
      val ga = grid(a); val gb = grid(b)
      (ga.keySet ++ gb.keySet).map(k => k -> (ga.getOrElse(k, 0L) + gb.getOrElse(k, 0L))).toMap
    }
    assert(grid(corpus) == merged)
  }

  test("cm never-seen probe estimates 0") {
    val sk = Sketch.cmSketch(corpus, "tok", depth = 4, width = 1 << 20)
    val est = Sketch.cmEstimates(sk, Seq("zzz-never-seen").toDF("tok"), "tok", 4, 1 << 20)
      .as[(String, Long)].collect().head
    assert(est._2 == 0L)
  }

  // ---------------------------------------------------------------- //
  // KMV                                                              //
  // ---------------------------------------------------------------- //

  test("kmv with k >= distinct is exact, estimate within 3x otherwise") {
    // k larger than the domain: sketch holds everything -> exact.
    val sk = Sketch.kmvPerGroup(corpus, "source", "tok", k = 64)
    val est = Sketch.kmvEstimate(sk, "source", k = 64)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(est("a")._3 == 4.0) // x y z w
    assert(est("b")._3 == 7.0) // p q r s t u v
    // Small k on a wider synthetic domain: estimate is in the right
    // ballpark (KMV with k=16 over 200 distinct values; the bound here
    // is loose on purpose — the estimator's exact arithmetic is pinned
    // by the q_kmv_distinct oracle, this guards order-of-magnitude).
    val wide = (1 to 200).map(i => ("w", s"tok_$i")).toDF("source", "tok")
    val e2 = Sketch.kmvEstimate(Sketch.kmvPerGroup(wide, "source", "tok", 16), "source", 16)
      .as[(String, Long, Double)].collect().head
    assert(e2._2 == 16L)
    assert(e2._3 > 200.0 / 3 && e2._3 < 200.0 * 3, s"kmv estimate ${e2._3} far from 200")
  }

  test("kmv sketches merge by union + re-take bottom-k") {
    val all = corpus.drop("source").withColumn("source", lit("all"))
    val k = 5
    val direct = Sketch.kmvPerGroup(all, "source", "tok", k)
      .select("h").as[Long].collect().toSet
    // Merge path: union the per-source sketches, keep the k smallest.
    val merged = Sketch.kmvPerGroup(corpus, "source", "tok", k)
      .select("h").distinct().as[Long].collect().sorted.take(k).toSet
    assert(direct == merged)
  }

  // ---------------------------------------------------------------- //
  // Bloom                                                            //
  // ---------------------------------------------------------------- //

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of bench doc 1
    (3L, "totally different words that share nothing with the bench set at all"))
    .toDF("doc_id", "text")

  test("bloom has no false negatives: bench members always flagged") {
    val bench = docs.filter(col("doc_id") === 1)
    val bits = Sketch.bloomArray(
      Sketch.bloomBits(bench, "text", shingleN = 3, numHashes = 3, mBits = 4096), 4096)
    val flagged = Sketch.bloomContamination(docs, "doc_id", "text", bits,
      shingleN = 3, numHashes = 3, minHits = 5)
      .select("doc_id").as[Long].collect().toSet
    // doc 1 (the bench doc itself) and doc 2 (its exact dup) carry the
    // bench shingles -> must be flagged; membership is never missed.
    assert(flagged.contains(1L) && flagged.contains(2L))
  }

  test("bloom bit sets merge by OR (bits of union == union of bits)") {
    val b1 = docs.filter(col("doc_id") === 1)
    val b3 = docs.filter(col("doc_id") === 3)
    def bs(df: org.apache.spark.sql.DataFrame) =
      Sketch.bloomBits(df, "text", 3, 3, 4096).as[Long].collect().toSet
    assert(bs(docs.filter(col("doc_id") =!= 2)) == (bs(b1) ++ bs(b3)))
  }

  test("bloomArray rejects out-of-range positions") {
    intercept[Exception] {
      Sketch.bloomArray(Seq(5000L).toDF("pos"), mBits = 4096)
    }
  }

  test("broadcast bloom at 2^20 bits: identical output, handle-sized plan") {
    // the production form: same bits via SparkContext.broadcast +
    // the codegen'd BloomAllSet probe, pinned equal to the literal
    // form at a filter size where the literal would already be a
    // megabyte of plan
    val mBits = 1 << 20
    val bench = docs.filter(col("doc_id") === 1)
    val bits = Sketch.bloomArray(
      Sketch.bloomBits(bench, "text", shingleN = 3, numHashes = 3, mBits = mBits), mBits)
    val literal = Sketch.bloomContamination(docs, "doc_id", "text", bits,
      shingleN = 3, numHashes = 3, minHits = 1)
      .as[(Long, Long)].collect().toSet
    // the broadcast form ships WORD-PACKED words (64 bits/long); the
    // packed set must carry exactly the boolean[] bits
    val words = Sketch.bloomBitset(
      Sketch.bloomBits(bench, "text", shingleN = 3, numHashes = 3, mBits = mBits), mBits)
    assert(words.length == mBits / 64)
    for (p <- 0 until mBits)
      assert(((words(p >>> 6) >>> (p & 63) & 1L) != 0L) == bits(p),
        s"packed bit $p disagrees with boolean[] form")
    val bcast = spark.sparkContext.broadcast(words)
    try {
      val viaBcast = Sketch.bloomContamination(docs, "doc_id", "text", bcast,
        shingleN = 3, numHashes = 3, minHits = 1)
      assert(viaBcast.as[(Long, Long)].collect().toSet == literal,
        "broadcast form must be bit-identical to the literal form")
      // the plan must carry the broadcast HANDLE, not the 2^20 bits:
      // a literal plan at this size is ~4 MB of text, the broadcast
      // plan stays in the tens-of-KB ballpark
      val planLen = viaBcast.queryExecution.executedPlan.toString.length
      assert(planLen < 100 * 1024,
        s"broadcast-bloom plan blew up to $planLen chars — the bits leaked into the plan")
      assert(literal.map(_._1) == Set(1L, 2L))
    } finally bcast.destroy()
  }
}
