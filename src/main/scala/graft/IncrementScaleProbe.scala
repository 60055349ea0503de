package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: adjudicate q_semantic_increment_scaled's 4.0× SCALECURVE
  * row by SEPARATING the two growth terms the benchmark conflates. In
  * the curve query the batch is derived from the same SF dir as the
  * corpus, so across 100× data BOTH sides grow 100× — and the in-batch
  * pair term is quadratic in batch by construction. A real daily
  * increment has a corpus-small batch: this probe times
  * [[graft.operators.SemanticDedup.semanticIncrement]] with the batch
  * side PINNED to the smallest SF's rows while the corpus/index side
  * scales, at the same size-derived |C| = ⌊√N⌋ / |S| = ⌊√|C|⌋ / 2-band
  * knobs the curve query runs. If the pinned-batch column grows ~like
  * the corpus scan (≲2× across 100×) while the curve row grows 4.0×,
  * the excess is the batch's own quadratic term — the documented bound,
  * now with numbers.
  *
  * Usage: `runMain graft.IncrementScaleProbe <batchDir> <corpusDir1,corpusDir2,...>`
  * (defaults: batch /root/testdata/sf0.01; corpus sf0.01, sf0.1,
  * /tmp/graft_sf1 — generate the last with ScaleUpData first). */
object IncrementScaleProbe {
  def main(args: Array[String]): Unit = {
    val batchDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val corpusDirs =
      (if (args.length > 1) args(1) else
        "/root/testdata/sf0.01,/root/testdata/sf0.1,/tmp/graft_sf1")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def emb(dir: String): DataFrame =
      sources.TableLoader.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))

    // the pinned batch: the curve query's batch layout at the SMALLEST
    // SF (new rows + planted corpus copies + planted batch copies)
    val bBase = emb(batchDir)
    val batch = bBase.filter(col("vec_id") >= 250)
      .unionByName(bBase.filter(col("vec_id") < 50)
        .select((col("vec_id") + 20000).as("vec_id"), col("embedding")))
      .unionByName(bBase.filter(col("vec_id") >= 250 && col("vec_id") < 300)
        .select((col("vec_id") + 30000).as("vec_id"), col("embedding")))
      .persist()
    val nBatch = batch.count()

    // INTERLEAVED passes (r17, the ScaleCurve/Bench discipline): all
    // dirs' indexes stay persisted at once and the timed passes are
    // PASS-MAJOR, so a host disturbance must span the whole run to
    // corrupt any dir's min — the r16 consecutive-per-dir schedule left
    // the 3rd→4th-decade "bump" (1.76 → 2.58 s) unadjudicable against
    // the box's documented ±14% oscillation. Spread (max/min) prints
    // per dir alongside the min.
    val states = corpusDirs.map { dir =>
      val base = emb(dir)
      val n = base.count()
      val nCents = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
      val nSupers = math.max(1L, math.floor(math.sqrt(nCents.toDouble)).toLong)
      val cents = base.filter(col("vec_id") < nCents)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      def planesIn(lo: Long, hi: Long) = base
        .filter(col("vec_id") >= lo && col("vec_id") < hi).orderBy("vec_id")
        .select(col("embedding").cast("array<double>")).collect()
        .map(_.getSeq[Double](0)).toSeq
      val corpus = base.filter(col("vec_id") < n) // the whole table is the corpus
      val index = operators.Ann.assignCellsHier(corpus, "vec_id", "embedding",
        cents, "centroid_id", "cvec", nSupers = nSupers.toInt).persist()
      index.count()
      val bands = Seq(planesIn(0, 2), planesIn(2, 4))
      (dir, n, nCents, nSupers, cents, index, bands)
    }
    def time(st: (String, Long, Long, Long, DataFrame, DataFrame, Seq[Seq[Seq[Double]]])): Double = {
      val (_, _, _, nSupers, cents, index, bands) = st
      val t0 = System.nanoTime()
      operators.SemanticDedup.semanticIncrement(batch, "vec_id", "embedding",
          index, cents, "centroid_id", "cvec", tau = 0.9,
          nSupers = nSupers.toInt, bands = bands)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    states.foreach(time) // warmup pass, unrecorded
    val passes = 3
    val samples = states.map(_ => scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to passes).foreach { p =>
      states.zipWithIndex.foreach { case (st, i) =>
        val t = time(st)
        samples(i) += t
        System.err.println(f"[increment] pass $p/$passes ${st._1}: $t%.2f s")
      }
    }
    states.zipWithIndex.foreach { case ((dir, n, nCents, nSupers, _, index, _), i) =>
      val ts = samples(i)
      println(f"INCREMENT fixed-batch corpus=$dir N=$n batch=$nBatch " +
        f"|C|=$nCents |S|=$nSupers: min=${ts.min}%.2f s spread=${ts.max / ts.min}%.2f " +
        f"passes=${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
      index.unpersist()
    }
    spark.stop()
  }
}
