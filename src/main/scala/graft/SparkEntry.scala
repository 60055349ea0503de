package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators._

/** Driver contract — one `queries` entry (+ DuckDB oracle SQL where
  * expressible) per implemented operator from SURVEY.md §2 and the
  * north-star pipeline surface.
  *
  * Conventions for hash-stable oracle comparison (SURVEY §5, §7.5):
  *  - every query ends in a total ORDER BY over output columns;
  *  - integer outputs are cast to BIGINT on both sides;
  *  - derived floats are computed in Double on both sides (same fold
  *    order) and rounded to 6 places; raw doubles pass through untouched;
  *  - money aggregates go through DECIMAL (exact, order-independent),
  *    cast to DECIMAL(38,6) on both sides;
  *  - hash-derived values use md5 hex (identical text in both engines).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true it reads as BIGINT nanos.
    * Convert to a proper timestamp (µs precision — the data's actual
    * granularity) so event-time ops stay idiomatic. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else raw
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference ask-pipeline (§3.1): chunk → embed → top-k →
    * context assembly → prompt. */
  def entry(spark: SparkSession): DataFrame =
    Retrieval.ask(spark,
      t(spark, "/root/testdata/sf0.001", "documents"),
      query = "fast table scan merge join", topK = 3)

  // ---------------------------------------------------------------- //
  // Shared SQL fragments for the DuckDB oracles                      //
  // ---------------------------------------------------------------- //

  /** DuckDB: tokens of cleaned text (mirror of TextFunctions.tokens). */
  private def dTokens(texpr: String) =
    s"string_split_regex(trim(replace($texpr, chr(10), ' ')), '\\s+')"

  /** DuckDB: dot product of two float lists in Double, left fold order. */
  private def dDot(a: String, b: String, dim: Int = Schemas.EmbeddingDim) =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def dNorm(a: String, dim: Int = Schemas.EmbeddingDim) =
    s"sqrt(${dDot(a, a, dim)})"

  /** DuckDB: cosine with the reference's zero-norm guard. */
  private def dCosine(a: String, b: String, dim: Int = Schemas.EmbeddingDim) =
    s"(CASE WHEN ${dNorm(a, dim)} = 0 OR ${dNorm(b, dim)} = 0 THEN 0.0 " +
      s"ELSE ${dDot(a, b, dim)} / (${dNorm(a, dim)} * ${dNorm(b, dim)}) END)"

  // ---------------------------------------------------------------- //
  // Queries                                                          //
  // ---------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O-7/O-8: clean + 32-word chunking of the documents corpus.
    "q_chunk" -> ((s, dir) => {
      Ingest.chunk(t(s, dir, "documents").select("doc_id", "text"), "text", 32)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // Text analysis: token counts (whitespace + BPE-ish subword regex).
    "q_token_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"))
        .orderBy("doc_id")
    }),

    // F-1/O-11/O-18: exact top-10 cosine retrieval for one query vector.
    "q_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Similarity.topK(e.select("vec_id", "embedding"), "embedding", qv, 10)
        .select(col("vec_id"), round(col("sim"), 6).as("sim"))
    }),

    // O-11 batch shape: 5 query vectors × all index rows, top-3 each.
    "q_knn_batch" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Similarity.knnJoin(queries, "query_id", "qvec", e.select("vec_id", "embedding"), "vec_id", "embedding", 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // F-2: L2 normalization with the reference's 1e-9 epsilon.
    "q_l2_normalize" -> ((s, dir) => {
      withL2Normalized(t(s, dir, "embeddings"), "embedding", "nvec")
        .select(
          col("vec_id"),
          round(l2Norm(col("embedding")), 6).as("norm"),
          round(element_at(col("nvec"), 1), 6).as("first_elem"))
        .orderBy("vec_id")
    }),

    // Relational core: TPC-H Q1-flavor pricing summary (decimal-exact).
    "q1_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,6)").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,6)").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(38,6)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Join pipeline: revenue per nation (broadcast dims, partial aggs).
    "q_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(38,6)").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // O-18 per-group: top-3 orders per customer by totalprice (window).
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank").cast("long").as("rank"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rank")
    }),

    // O-13: auth-shaped existence semi-join.
    "q_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Anti-join: customers with no orders.
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Grouping sets: rollup with NULLs coalesced for oracle stability.
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,6)").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n_rows"))
        .orderBy("returnflag", "linestatus")
    }),

    // S-3 batch shape: tumbling 10-minute event-time windows.
    "q_events_tumbling" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(38,6)").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // F-5: JSON decode of the event props payload.
    "q_json_extract" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    }))

  // ---------------------------------------------------------------- //
  // DuckDB oracles                                                   //
  // ---------------------------------------------------------------- //

  def oracleSql: Map[String, String] = Map(

    "q_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${dTokens("text")} AS words FROM documents
         |), c AS (
         |  SELECT doc_id, words,
         |         unnest(range(0, CAST(ceil(len(words) / 32.0) AS BIGINT))) AS chunk_idx
         |  FROM t
         |)
         |SELECT doc_id, chunk_idx,
         |       array_to_string(list_slice(words, chunk_idx * 32 + 1, chunk_idx * 32 + 32), ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_token_stats" ->
      s"""SELECT doc_id,
         |       CAST(len(${dTokens("text")}) AS BIGINT) AS n_tokens,
         |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_subwords
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (
         |  SELECT e.vec_id, ${dCosine("e.embedding", "q.qv")} AS sim
         |  FROM embeddings e, q
         |)
         |SELECT vec_id, round(sim, 6) AS sim
         |FROM s ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

    "q_knn_batch" ->
      s"""WITH s AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |         ${dCosine("e.embedding", "q.embedding")} AS sim
         |  FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
         |), r AS (
         |  SELECT query_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM s
         |)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, round(sim, 6) AS sim
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q_l2_normalize" ->
      s"""SELECT vec_id,
         |       round(${dNorm("embedding")}, 6) AS norm,
         |       round(CAST(embedding[1] AS DOUBLE) / (${dNorm("embedding")} + 1e-9), 6) AS first_elem
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,6)) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_revenue" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,6)) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_window_topn" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders
        |)
        |SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey, o_totalprice
        |FROM r WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sum_qty,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_events_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 AS window_start,
        |       event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin)
}
