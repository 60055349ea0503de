package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val queryVec: Seq[Double] =
    embeddings.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

  test("brute force top-k: query vector's own row ranks first with sim 1") {
    val top = Ann.bruteForceTopK(embeddings.select("vec_id", "embedding"),
      "vec_id", "embedding", queryVec, 5).collect()
    assert(top.head.getAs[Long]("vec_id") == 0L)
    assert(math.abs(top.head.getAs[Double]("sim") - 1.0) < 1e-9)
    val sims = top.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("IVF: probing all cells recovers the exact top-k") {
    val e = embeddings.select("vec_id", "embedding")
    val cents = Ann.headCentroids(e, "vec_id", "embedding", 8)
    val assigned = Ann.assignCells(e, "vec_id", "embedding", cents, "centroid_id", "centroid_vec")
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", queryVec, 5)
      .select("vec_id").as[Long].collect().toSeq
    val ivfAll = Ann.ivfSearch(assigned, "vec_id", "embedding", cents,
      "centroid_id", "centroid_vec", queryVec, k = 5, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivfAll == exact)
    // narrow probe returns a subset of plausible candidates incl. vec 0
    val ivf2 = Ann.ivfSearch(assigned, "vec_id", "embedding", cents,
      "centroid_id", "centroid_vec", queryVec, k = 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf2.contains(0L))
  }

  test("k-means refinement tightens cells (mean assignment sim does not degrade)") {
    val e = embeddings.select("vec_id", "embedding")
    val init = Ann.headCentroids(e, "vec_id", "embedding", 8)
    def meanSim(cents: org.apache.spark.sql.DataFrame): Double =
      Ann.assignCells(e, "vec_id", "embedding", cents, "centroid_id", "centroid_vec")
        .agg(avg("cell_sim")).head().getDouble(0)
    val before = meanSim(init)
    val refined = Ann.kmeansRefine(e, "vec_id", "embedding", init, Schemas.EmbeddingDim, iters = 2)
    val after = meanSim(refined)
    assert(refined.count() <= 8)
    assert(refined.select("centroid_vec").head().getSeq[Double](0).length == Schemas.EmbeddingDim)
    assert(after >= before - 1e-9, s"refinement degraded assignment: $before -> $after")
    // refined centroids still support exact-recall search at full probe
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", queryVec, 5)
      .select("vec_id").as[Long].collect().toSeq
    val assigned = Ann.assignCells(e, "vec_id", "embedding", refined, "centroid_id", "centroid_vec")
    val nCells = refined.count().toInt
    val full = Ann.ivfSearch(assigned, "vec_id", "embedding", refined,
      "centroid_id", "centroid_vec", queryVec, k = 5, nprobe = nCells)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
  }

  test("sign-LSH search: query bucket contains the query row itself") {
    val e = embeddings.select("vec_id", "embedding")
    val planes = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val hits = Ann.lshSearch(e, "vec_id", "embedding", planes, queryVec, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits.contains(0L))
  }

  test("MLlib BRP-LSH: approx neighbors of the query include itself; deterministic under seed") {
    val e = embeddings.select("vec_id", "embedding")
    val (model, transformed) = Ann.fitBrpLsh(e, "embedding", numHashTables = 4, bucketLength = 2.0)
    val nn = Ann.brpApproxNeighbors(model, transformed, queryVec, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(nn.contains(0L))
    val (model2, transformed2) = Ann.fitBrpLsh(e, "embedding", numHashTables = 4, bucketLength = 2.0)
    val nn2 = Ann.brpApproxNeighbors(model2, transformed2, queryVec, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(nn == nn2)
  }

  test("MLlib MinHashLSH join finds planted near-duplicates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "some wholly unrelated words about distributed query engines"))
      .toDF("doc_id", "text")
    val pairs = Ann.mlMinHashJoin(docs, "doc_id", "text", maxJaccardDistance = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
