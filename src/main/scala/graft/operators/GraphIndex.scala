package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graph-ANN store BEHIND the ask pipeline — the reference's actual
  * serving architecture: ingest builds an HNSW index once
  * (app/main.py:262-283, m=64/ef_construction=500) and every `/ask`
  * searches that index (app/main.py:347-373); nothing at query time
  * ever scans the corpus.
  *
  * [[build]] is the ingest-time half: give each embedded chunk a stable
  * 60-bit id (md5-derived — map-only, no global sort, deterministic
  * across runs and engines), pick entry centroids, build the k-NN graph
  * ([[Ann.knnGraph]]) and persist it src-bucketed
  * ([[Ann.writeGraphIndex]]) next to the uid-bucketed id→chunk sidecar
  * and the centroid table. [[search]] is the query-time half: a
  * partition-pruned beam walk ([[Ann.graphSearchPartitioned]]) whose
  * per-hop reads touch only the frontier's buckets, then a
  * partition-pruned sidecar read for the visited set — ask latency
  * rides beam·degree, independent of index size, which is exactly why
  * the reference puts an HNSW (not a scan) behind its hot path.
  * [[insert]] is the live-upload half (ref app/embedding_gen.py:315-409
  * appends new docs to the running index): batch-vs-cell work only,
  * append-only writes.
  */
object GraphIndex {

  /** A built store: everything needed to search lives under `dir`
    * (`edges/` src-bucketed, `chunks/` uid-bucketed id→row sidecar with
    * the cell assignment, `centroids/`), so a handle is just the
    * location + layout/build constants — serving processes re-open it
    * without re-reading the corpus. */
  final case class Handle(dir: String, nBuckets: Int,
                          beamWidth: Int = 8, hops: Int = 3, m: Int = 4) {
    def edgesDir: String = dir + "/edges"
    def chunksDir: String = dir + "/chunks"
    def centroidsDir: String = dir + "/centroids"
    def centroids(spark: SparkSession): DataFrame =
      spark.read.parquet(centroidsDir)
    def chunks(spark: SparkSession): DataFrame =
      spark.read.parquet(chunksDir)
  }

  /** Stable 60-bit row id from the natural key columns: the first 15
    * md5 hex chars as a long. Map-only (a global row_number would
    * single-partition 100 TB through one sort); deterministic across
    * runs AND replayable in the SQL oracle (md5 hex text is
    * engine-identical). 2^60 space makes collisions negligible at any
    * plausible chunk count. */
  def uidFor(keyCols: Seq[String]): org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws("#", keyCols.map(c => col(c).cast("string")): _*)),
      1, 15), 16, 10).cast("long")

  private def bucketOf(uid: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(uid, lit(nBuckets))

  /** Ingest-time build over an embedded index (any schema with `vecCol`
    * plus natural-key `keyCols`). Entry centroids are the `nCentroids`
    * lowest-uid rows — with hashed uids that is a deterministic random
    * sample (the same role [[Ann.headCentroids]] plays for IVF;
    * [[Ann.kmeansRefine]] drops in upstream when data-aware cells are
    * worth the extra passes). The sidecar is written
    * `partitionBy(uid_bucket)` — the search-path access (fetch ~beam·
    * degree uids) partition-prunes; it also carries `cell_id` so
    * [[insert]] can read a cell's members with a pushed filter instead
    * of re-assigning the corpus. The whole build is the one
    * corpus-sized job; everything after reads the store. */
  def build(spark: SparkSession, index: DataFrame, keyCols: Seq[String],
            vecCol: String, dir: String, nCentroids: Int = 8, m: Int = 4,
            nBuckets: Int = 16, beamWidth: Int = 8, hops: Int = 3): Handle = {
    require(nCentroids >= 1 && m >= 1 && nBuckets >= 1 && beamWidth >= 1 && hops >= 0,
      s"GraphIndex.build: nCentroids=$nCentroids m=$m nBuckets=$nBuckets " +
        s"beamWidth=$beamWidth hops=$hops must all be positive (hops >= 0)")
    val withUid = index.withColumn("uid", uidFor(keyCols))
    // duplicate natural keys (or a 2^-60 hash collision) would silently
    // merge two chunks into one graph node — fail the one-time build
    // loudly instead. One extra aggregation over data build already scans.
    val Array(n, nDistinct) = withUid
      .agg(count(lit(1)), countDistinct(col("uid"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    require(n == nDistinct,
      s"GraphIndex.build: ${n - nDistinct} duplicate uid(s) — keyCols " +
        s"${keyCols.mkString("(", ",", ")")} are not unique over the index")
    val cents = withUid.orderBy("uid").limit(nCentroids)
      .select(col("uid").as("centroid_id"), col(vecCol).as("centroid_vec"))
    cents.write.mode("overwrite").parquet(dir + "/centroids")
    val storedCents = spark.read.parquet(dir + "/centroids")
    val assigned = Ann.assignCells(withUid, "uid", vecCol,
      storedCents, "centroid_id", "centroid_vec")
    assigned.drop("cell_sim")
      .withColumn("uid_bucket", bucketOf(col("uid"), nBuckets))
      .write.mode("overwrite").partitionBy("uid_bucket").parquet(dir + "/chunks")
    val stored = spark.read.parquet(dir + "/chunks")
    val edges = Ann.knnGraph(stored, "uid", vecCol,
      storedCents, "centroid_id", "centroid_vec", m)
    Ann.writeGraphIndex(edges, dir + "/edges", nBuckets)
    Handle(dir, nBuckets, beamWidth, hops, m)
  }

  /** Every node the beam walk visits, scored, re-joined to its chunk
    * row — shaped like the exact-retrieval candidate set (original
    * columns + `sim`), so downstream context assembly cannot tell which
    * retriever ran. Callers apply their own top-k / rounding. */
  def search(spark: SparkSession, h: Handle, queryVec: Seq[Double]): DataFrame = {
    val visited = Ann.graphSearchPartitioned(spark, h.edgesDir, h.nBuckets,
      h.centroids(spark), "centroid_id", "centroid_vec",
      queryVec, h.beamWidth, h.hops)
    // the visited set is KB-scale (beam·degree·hops rows): prune the
    // sidecar read to its uid buckets (partition pruning at the file
    // listing — without this the re-attach is a full corpus scan per
    // query, undoing the walk's whole point), then broadcast-join so
    // nothing shuffles
    val ids = visited.select("vec_id").collect().map(_.getLong(0))
    val buckets = ids.map(id => Long.box(((id % h.nBuckets) + h.nBuckets) % h.nBuckets)).distinct
    h.chunks(spark)
      .filter(col("uid_bucket").isin(buckets: _*))
      .join(broadcast(visited.withColumnRenamed("vec_id", "uid")), "uid")
      .drop("uid_bucket")
  }

  /** Graph-ANN top-k in [[Similarity.topK]]'s output shape. */
  def topK(spark: SparkSession, h: Handle, queryVec: Seq[Double], k: Int,
           tieBreak: Seq[String]): DataFrame =
    search(spark, h, queryVec)
      .orderBy(desc("sim") +: tieBreak.map(col): _*)
      .limit(k)
      .drop("uid", "cell_id")

  /** Batched serving — many queries walk the store TOGETHER (the
    * reference holds N open ask sessions against one HNSW,
    * app/main.py:616-647). One partition-pruned edge read per hop
    * serves the union of every query's frontier
    * ([[Ann.graphSearchBatchPartitioned]] — per-hop store reads do not
    * scale with query count) and ONE bucket-pruned sidecar read
    * re-attaches all visited sets. `queries` is the per-request side
    * (small, broadcast); returns (query_id, chunk columns, sim). */
  def searchBatch(spark: SparkSession, h: Handle, queries: DataFrame,
                  qIdCol: String, qVecCol: String): DataFrame = {
    val visited = Ann.graphSearchBatchPartitioned(spark, h.edgesDir, h.nBuckets,
      h.centroids(spark), "centroid_id", "centroid_vec",
      queries, qIdCol, qVecCol, h.beamWidth, h.hops)
    val ids = visited.select("vec_id").distinct().collect().map(_.getLong(0))
    val buckets = ids.map(id => Long.box(((id % h.nBuckets) + h.nBuckets) % h.nBuckets)).distinct
    h.chunks(spark)
      .filter(col("uid_bucket").isin(buckets: _*))
      .join(broadcast(visited.withColumnRenamed("vec_id", "uid")), "uid")
      .drop("uid_bucket")
  }

  /** Per-query top-k over [[searchBatch]] (window rank keyed by
    * query_id — the q_knn_batch shape). */
  def topKBatch(spark: SparkSession, h: Handle, queries: DataFrame,
                qIdCol: String, qVecCol: String, k: Int,
                tieBreak: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("sim") +: tieBreak.map(col): _*)
    searchBatch(spark, h, queries, qIdCol, qVecCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("uid", "cell_id")
  }

  /** Live incremental ingest (the reference's upload path: new docs
    * join the running index without a rebuild). New rows are uid'd and
    * cell-assigned against the STORED centroids, linked by
    * [[Ann.graphInsert]] (batch-aware top-m + reverse edges + up-links)
    * against ONLY the members of the touched cells — read from the
    * sidecar with a pushed `cell_id` filter, never a corpus re-scan —
    * and both stores grow by `mode("append")` files: existing data is
    * never rewritten. Cost is |batch|·|touched cells|, independent of
    * index size. Returns the number of edge rows appended. */
  def insert(spark: SparkSession, h: Handle, newRows: DataFrame,
             keyCols: Seq[String], vecCol: String): Long = {
    val cents = h.centroids(spark)
    val newAssigned = Ann.assignCells(
      newRows.withColumn("uid", uidFor(keyCols)), "uid", vecCol,
      cents, "centroid_id", "centroid_vec")
    val touched = newAssigned.select("cell_id").distinct()
      .collect().map(_.getLong(0))
    val existing = h.chunks(spark)
      .filter(col("cell_id").isin(touched.map(Long.box): _*))
      .select(col("cell_id"), col("uid"), col(vecCol))
    val newEdges = Ann.graphInsert(existing,
      newAssigned.select(col("cell_id"), col("uid"), col(vecCol)),
      "uid", vecCol, h.m)
    val n = newEdges.count()
    Ann.appendGraphIndex(newEdges, h.edgesDir, h.nBuckets)
    newAssigned.drop("cell_sim")
      .withColumn("uid_bucket", bucketOf(col("uid"), h.nBuckets))
      .write.mode("append").partitionBy("uid_bucket").parquet(h.chunksDir)
    n
  }
}
