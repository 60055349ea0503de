package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.control.NonFatal

/** Opt-in HTTP transport for [[Embed.EmbedClient]] — a client for any
  * OpenAI/Ollama-compatible `POST <endpoint>` embeddings API (request
  * `{"model": m, "input": [texts...]}`, response
  * `{"data": [{"index": i, "embedding": [floats...]}, ...]}`), the
  * real-service counterpart of the reference's embedder call
  * (`ollama_embed_text`, app/main.py:134-145).
  *
  * The reference's batching semantics map onto the engine like this:
  *
  *  - **64-batch** (EMBED_BATCH, app/main.py:36): handled by
  *    [[Embed.withEmbeddingBatched]]'s `batchSize` — each client call
  *    receives one batch and issues ONE POST for it, never a request
  *    per row.
  *  - **Connection reuse**: one lazily-built JDK [[HttpClient]] per
  *    client instance, and [[Embed.withEmbeddingBatched]] constructs
  *    one instance per PARTITION — so a partition's batches share a
  *    keep-alive pool the way the reference's aiohttp session does.
  *  - **Bounded concurrency** (the reference's 5-concurrent semaphore,
  *    app/embedding_gen.py:139-169): concurrency here is the number of
  *    concurrently running partitions, bounded by the executor core
  *    count — backpressure is the scheduler's, not a client semaphore.
  *  - **Zero-vector on failure** (app/embedding_gen.py:147-148,
  *    164-166): any transport error, non-200 status, malformed body,
  *    missing index, or wrong-dimension vector degrades to the zero
  *    vector for the affected rows — ingestion never crashes on a
  *    flaky embedder, exactly the reference's sentinel discipline.
  *
  * Opt-in and config-gated by construction: nothing in the engine
  * constructs one of these — callers pass
  * `() => new HttpEmbedClient(endpoint, model)` as the
  * `clientFactory` slot, typically off their own config. No default
  * endpoint exists on purpose. JSON rides on Jackson, which Spark
  * already ships — no new dependency.
  *
  * The class itself is Serializable (the factory closure ships to
  * executors); the HttpClient and ObjectMapper are `@transient lazy`,
  * rebuilt on first use executor-side.
  *
  * @param endpoint   full URL of the embeddings route, e.g.
  *                   `http://localhost:11434/v1/embeddings`
  * @param model      model name forwarded in the request body
  * @param timeoutMs  connect + request timeout per POST
  * @param retries    immediate re-sends after a transport error or
  *                   5xx before degrading the batch to zero vectors
  *                   (0 = the reference's fail-to-sentinel behavior)
  */
final class HttpEmbedClient(endpoint: String, model: String,
                            timeoutMs: Int = 30000,
                            retries: Int = 0) extends Embed.EmbedClient {
  require(endpoint.startsWith("http://") || endpoint.startsWith("https://"),
    s"HttpEmbedClient endpoint must be an http(s) URL, got '$endpoint'")

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs.toLong))
    .build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def embedBatch(texts: Seq[String], dim: Int): Seq[Array[Double]] = {
    if (texts.isEmpty) return Seq.empty
    def zeros: Seq[Array[Double]] = texts.map(_ => new Array[Double](dim))
    val body = {
      val root = mapper.createObjectNode()
      root.put("model", model)
      val arr = root.putArray("input")
      texts.foreach(arr.add)
      mapper.writeValueAsString(root)
    }
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    var attempt = 0
    while (attempt <= retries) {
      try {
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) return parse(resp.body(), texts.length, dim)
        // 4xx won't improve on retry; 5xx might
        if (resp.statusCode() < 500) return zeros
      } catch { case NonFatal(_) => () }
      attempt += 1
    }
    zeros
  }

  /** Decode the response; per-ROW zero-vector degradation: rows whose
    * entry is absent or has the wrong dimensionality become zeros
    * without poisoning their batch-mates. The `index` field is
    * authoritative for row alignment (the API contract allows
    * out-of-order `data`). */
  private def parse(body: String, n: Int, dim: Int): Seq[Array[Double]] = {
    val out = Array.fill(n)(new Array[Double](dim))
    try {
      val data = mapper.readTree(body).path("data")
      if (data.isArray) {
        data.forEach { node =>
          val i = node.path("index").asInt(-1)
          val emb = node.path("embedding")
          if (i >= 0 && i < n && emb.isArray && emb.size() == dim) {
            val v = new Array[Double](dim)
            var j = 0
            while (j < dim) { v(j) = emb.get(j).asDouble(); j += 1 }
            out(i) = v
          }
        }
      }
      out.toSeq
    } catch { case NonFatal(_) => Array.fill(n)(new Array[Double](dim)).toSeq }
  }
}
