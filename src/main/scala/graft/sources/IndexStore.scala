package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The vector-index store (SURVEY.md §2 O-4, O-5, O-13).
  *
  * The reference's "index" is an OpenSearch index per tenant
  * (`f"{BASE}-{user_id}"`, app/embedding_gen.py:91, created lazily
  * :83-122, bulk-upserted in 64-action batches :237-257). The Spark-native
  * equivalent is a parquet table partitioned by user_id:
  *
  *  - per-tenant isolation  → `partitionBy("user_id")` directory layout;
  *  - lazy index creation   → partition dirs appear on first append;
  *  - tenant routing        → Catalyst partition pruning: a query filtered
  *    on user_id reads ONLY that tenant's files (`PartitionFilters` in the
  *    scan node) — at 100 TB this is the difference between scanning one
  *    tenant's GBs and the whole corpus;
  *  - 64-action bulk batches → an artifact of the HTTP API; Spark's file
  *    sink batches by partition natively.
  */
object IndexStore {

  /** Append embedded chunks to the tenant-partitioned index. */
  def appendToIndex(embedded: DataFrame, indexDir: String): Unit =
    embedded.write.mode("append").partitionBy("user_id").parquet(indexDir)

  /** Read one tenant's slice — partition-pruned scan. */
  def readTenant(spark: SparkSession, indexDir: String, userId: String): DataFrame =
    spark.read.parquet(indexDir).filter(col("user_id") === userId)

  /** Index emptiness probe (O-5): the reference's has_any_data gate
    * (app/main.py:300-307) — used to skip re-ingest. */
  def hasAnyData(spark: SparkSession, indexDir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && !spark.read.parquet(indexDir).isEmpty
  }

  /** Write a table bucketed (and sorted) by join key. Two tables bucketed
    * the same way join WITHOUT a shuffle — at 100 TB, pre-bucketing the
    * chunk index and its metadata tables turns every index-maintenance
    * join into a local zip of co-located buckets. Requires a catalog
    * table (bucket metadata lives in the catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Upsert one tenant's documents — the reference's bulk `_id` upsert
    * (re-uploading a document replaces its chunks, app/embedding_gen.py
    * bulk actions): read ONLY that tenant's partition, drop the chunks
    * of the doc ids being replaced, union the new chunks, and rewrite
    * ONLY that tenant's partition via dynamic partition overwrite — the
    * rest of the index (at 100 TB: every other tenant's files) is never
    * read or written. Single-writer-per-tenant is assumed, as with any
    * file-based overwrite.
    *
    * A write cannot overwrite the path it is reading, so the merged
    * partition stages through an underscore-prefixed dir inside the
    * index (underscore paths are invisible to parquet readers) and is
    * re-read from there for the overwrite — fault-tolerant on a real
    * cluster (both steps are plain retryable file writes), unlike an
    * eager in-memory checkpoint of the survivors. */
  def upsertTenantDocs(spark: SparkSession, indexDir: String, userId: String,
                       newChunks: DataFrame): Unit = {
    val replacedIds = newChunks.select("doc_id").distinct()
    val survivors = readTenant(spark, indexDir, userId)
      .join(broadcast(replacedIds), Seq("doc_id"), "left_anti")
    val merged = survivors.unionByName(newChunks.withColumn("user_id", lit(userId)))
    rewriteTenantPartition(spark, indexDir, userId, merged)
  }

  /** The shared staged rewrite behind [[upsertTenantDocs]] and
    * [[deleteTenantDocs]]: write the tenant's full replacement content
    * as real files under an underscore dir (invisible to parquet
    * readers — a write cannot overwrite the path it reads), then
    * dynamic-overwrite ONLY that tenant's partition from the stage.
    * The staging path is keyed by an md5 of the tenant id (ids may
    * contain path-hostile characters), so the documented
    * single-writer-PER-TENANT model holds across tenants: concurrent
    * operations on different tenants never share a staging dir. */
  private def rewriteTenantPartition(spark: SparkSession, indexDir: String,
                                     userId: String, rows: DataFrame): Unit = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val staging = s"$indexDir/_staging_$key"
    rows.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("user_id")
      .parquet(indexDir)
    val sp = new org.apache.hadoop.fs.Path(staging)
    sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)
  }

  /** Delete a tenant's documents from the index — the reference's
    * delete-by-`_id` on the per-tenant OpenSearch index, and the
    * building block of a data-subject erasure request: read ONLY the
    * tenant's partition, drop the named docs' chunks, rewrite ONLY that
    * partition (dynamic partition overwrite through the same staged
    * underscore dir as [[upsertTenantDocs]] — no other tenant's files
    * are read or written). Deleting a tenant's LAST doc falls through
    * to [[purgeTenant]]: dynamic overwrite writes only partitions
    * present in the output, so an all-deleted tenant must drop its dir
    * explicitly or the old files would silently survive. */
  def deleteTenantDocs(spark: SparkSession, indexDir: String, userId: String,
                       docIds: DataFrame): Unit = {
    val survivors = readTenant(spark, indexDir, userId)
      .join(broadcast(docIds.select("doc_id").distinct()), Seq("doc_id"), "left_anti")
    if (survivors.isEmpty) purgeTenant(spark, indexDir, userId)
    else rewriteTenantPartition(spark, indexDir, userId, survivors)
  }

  /** Erase a tenant entirely (account deletion): drop the partition
    * dir. O(1) metadata work — no read, no rewrite, no other tenant
    * touched; the next append recreates the dir lazily.
    *
    * The partition value is escaped EXACTLY the way Spark's writer
    * escaped it when naming the dir (ExternalCatalogUtils.escapePathName
    * — `%XX` for path-hostile characters): a raw `user_id=$userId`
    * path misses for such tenants and the erasure would silently leave
    * their files on disk. Belt-and-braces for an erasure primitive: if
    * the dir cannot be located but the tenant's rows are still
    * readable, fail loudly rather than return as if purged. */
  def purgeTenant(spark: SparkSession, indexDir: String, userId: String): Unit = {
    val escaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(userId)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/user_id=$escaped")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
    else {
      val root = new org.apache.hadoop.fs.Path(indexDir)
      require(!fs.exists(root) || readTenant(spark, indexDir, userId).isEmpty,
        s"purgeTenant: partition dir for tenant '$userId' not found at " +
          s"'$p' but the tenant's rows are still readable — refusing to " +
          "report an erasure that did not happen")
    }
  }

  /** Merge the per-append small files of a partitioned store back to
    * one file per partition dir — [[appendToIndex]] adds a file set per
    * upload batch, and a year of uploads makes every tenant-pruned read
    * open thousands of tiny files (the classic partitioned-store
    * failure mode at 100 TB; the reference's OpenSearch runs segment
    * force-merge for exactly this reason). Content-preserving by
    * construction: read everything, cluster writers by the partition
    * columns, stage through the underscore dir (invisible to parquet
    * readers), dynamic-overwrite each partition from the stage. Both
    * steps are plain retryable file writes; single writer assumed. */
  def compactPartitioned(spark: SparkSession, dir: String,
                         partitionCols: Seq[String]): Unit = {
    val staging = s"$dir/_compact_staging"
    spark.read.parquet(dir)
      .repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
    val sp = new org.apache.hadoop.fs.Path(staging)
    sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)
  }

  /** Cluster a table for stats-based scan pruning: range-repartition on
    * the cluster key (each output file covers a narrow, NON-OVERLAPPING
    * key range), then sort within partitions (tight per-row-group min/max
    * footer stats). A read filtered on the key pushes the predicate into
    * the parquet reader, which then skips whole files and row groups
    * whose stat range misses it — at 100 TB this cuts a key-range probe
    * from a full-table scan to a handful of files, WITHOUT the directory
    * explosion `partitionBy` would cause on a high-cardinality key.
    * (Complementary to [[writeBucketed]], which optimizes the join side;
    * this optimizes selective scans.) */
  def writeClustered(df: DataFrame, dir: String, clusterCol: String,
                     numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(dir)

  /** Auth gate (O-13): keep only requests whose user exists with non-blank
    * id + email (app/embedding_gen.py:296-301) — a broadcast left-semi
    * join, the distributed form of the reference's per-request SQL probe. */
  def authorized(requests: DataFrame, users: DataFrame): DataFrame = {
    val valid = users.filter(
      col("id").isNotNull && length(trim(col("id"))) > 0 &&
        col("email").isNotNull && length(trim(col("email"))) > 0)
    requests.join(broadcast(valid.select(col("id").as("user_id"))), Seq("user_id"), "left_semi")
  }
}
