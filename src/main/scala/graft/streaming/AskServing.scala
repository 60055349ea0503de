package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AskPipeline, GraphIndex}

/** The reference's `/ask` serving loop as a structured stream (the WS
  * loop, app/main.py:616-647: queries arrive continuously and each is
  * served against the shared index + semantic cache). Here queries
  * arrive on ANY streaming source; every micro-batch is answered by
  * ONE batched pipeline pass ([[AskPipeline.askBatch]] — no per-query
  * driver loop), answers land in a batch-keyed sink, and the LFU cache
  * EVOLVES across batches: an identical query in a later batch is a
  * cache hit, the reference's hot path.
  *
  * State discipline = the incremental dedup loops': the cache is
  * versioned per batch (`<serveDir>/cache/batch_id=N`, overwrite) and
  * a batch reads its PREDECESSOR's snapshot, so a crash-replayed
  * micro-batch recomputes from the same input state and overwrites its
  * own outputs idempotently — exactly-once effects without a
  * transactional store. Snapshots older than the predecessor are
  * pruned (replay can only revisit the latest uncommitted batch).
  * At scale the cache is capacity-bounded (`Schemas.CacheCapacity`),
  * so each snapshot is KB-scale regardless of corpus size, and the
  * graph-routed retrieval keeps per-batch work frontier-bounded. */
object AskServing {

  private val cacheSchema = StructType(Seq(
    StructField("entry_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("response", StringType),
    StructField("freq", IntegerType)))

  /** Start the serving loop over a streaming (query_id, query) frame. */
  def askStream(queries: DataFrame, index: DataFrame, serveDir: String,
                checkpoint: String,
                graph: Option[GraphIndex.Serving] = None,
                topK: Int = graft.Schemas.DefaultTopK,
                threshold: Double = graft.Schemas.CacheThreshold,
                capacity: Int = graft.Schemas.CacheCapacity,
                dim: Int = graft.Schemas.EmbeddingDim)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processAskMicroBatch(batch, batchId, index, serveDir, graph,
          topK, threshold, capacity, dim)
      }
      .start()

  /** One micro-batch — the testable replay contract, as with the other
    * incremental loops. */
  private[graft] def processAskMicroBatch(batch: DataFrame, batchId: Long,
                                          index: DataFrame, serveDir: String,
                                          graph: Option[GraphIndex.Serving],
                                          topK: Int, threshold: Double,
                                          capacity: Int, dim: Int): Unit = {
    val spark = batch.sparkSession
    val cacheRoot = new Path(s"$serveDir/cache")
    val fs = cacheRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val allIds: Seq[Long] =
      if (!fs.exists(cacheRoot)) Seq.empty
      else fs.listStatus(cacheRoot).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong)
    // snapshots AHEAD of this batch can only come from another
    // incarnation (a new checkpoint pointed at an old serveDir): batch
    // ids would eventually catch up and silently serve the previous
    // run's cache. A snapshot AT batchId is legitimate — the replay of
    // a batch that crashed after its own write. Fail loudly.
    require(allIds.forall(_ <= batchId),
      s"AskServing: cache snapshots ${allIds.filter(_ > batchId).sorted.mkString(",")} " +
        s"are ahead of micro-batch $batchId — this serveDir belongs to a " +
        "different stream incarnation; use a fresh serveDir (or the " +
        "original checkpoint)")
    val prevIds = allIds.filter(_ < batchId).sorted
    val cache = prevIds.lastOption match {
      case Some(n) => spark.read.parquet(s"$serveDir/cache/batch_id=$n")
      case None => spark.createDataFrame(java.util.List.of[Row](), cacheSchema)
    }
    // a micro-batch of ask REQUESTS is request-rate-sized (driver-held
    // by nature — these are interactive queries, not corpus rows)
    val qs = batch.select(col("query_id").cast("long"), col("query").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    if (qs.isEmpty) return
    val (results, updated) = AskPipeline.askBatch(spark, index, cache,
      qs.map(_._2), topK, threshold, capacity, dim, None, graph)
    import spark.implicits._
    qs.map(_._1).zip(results)
      .map { case (qid, r) => (qid, r.query, r.answer, r.fromCache) }
      .toDF("query_id", "query", "answer", "from_cache")
      .write.mode("overwrite").parquet(s"$serveDir/answers/batch_id=$batchId")
    updated.write.mode("overwrite").parquet(s"$serveDir/cache/batch_id=$batchId")
    // prune snapshots the replay contract can no longer need
    prevIds.dropRight(1).foreach(n =>
      fs.delete(new Path(s"$serveDir/cache/batch_id=$n"), true))
  }
}
