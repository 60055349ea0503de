package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.control.NonFatal

/** Opt-in HTTP transport for [[Retrieval.RerankClient]] — a client for
  * the de-facto rerank API shape (Cohere/Jina-compatible:
  * `POST <endpoint>` with `{"model": m, "query": q, "documents":
  * [texts...]}`, response `{"results": [{"index": i,
  * "relevance_score": s}, ...]}`). The cross-encoder counterpart of
  * [[HttpEmbedClient]], behind the same discipline:
  *
  *  - ONE POST per scoreBatch call per distinct query (the rerank API
  *    is one-query-many-documents; [[Retrieval.rerank]] sends a
  *    constant query per batch, so this is one POST per batch in
  *    practice — grouping preserves correctness if a caller mixes
  *    queries);
  *  - one lazily-built JDK HttpClient per instance = per partition
  *    (the factory slot in [[Retrieval.rerank]]) — keep-alive reuse;
  *  - `index`-keyed row alignment (the API may return results sorted
  *    by score, not input order);
  *  - NEUTRAL-SCORE degradation: transport error, non-200, malformed
  *    body, or a missing index scores 0.0 for the affected rows — the
  *    candidate list survives in fused order rather than crashing the
  *    ask (the zero-sentinel discipline of the embed path; rerank()'s
  *    one-score-per-pair contract stays intact because the output is
  *    always |pairs|-long).
  *
  * Opt-in and config-gated: no default endpoint; callers pass
  * `Some(() => new HttpRerankClient(endpoint, model))` to
  * [[Retrieval.askHybrid]]. Jackson from Spark's classpath.
  */
final class HttpRerankClient(endpoint: String, model: String,
                             timeoutMs: Int = 30000,
                             retries: Int = 0) extends Retrieval.RerankClient {
  require(endpoint.startsWith("http://") || endpoint.startsWith("https://"),
    s"HttpRerankClient endpoint must be an http(s) URL, got '$endpoint'")

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs.toLong))
    .build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def scoreBatch(pairs: Seq[(String, String)]): Seq[Double] = {
    if (pairs.isEmpty) return Seq.empty
    val out = new Array[Double](pairs.length)
    // one POST per distinct query, positions mapped back to the input
    pairs.zipWithIndex.groupBy(_._1._1).foreach { case (query, grp) =>
      val docs = grp.map(_._1._2)
      val scores = scoreOneQuery(query, docs)
      grp.map(_._2).zip(scores).foreach { case (pos, s) => out(pos) = s }
    }
    out.toSeq
  }

  private def scoreOneQuery(query: String, docs: Seq[String]): Seq[Double] = {
    def zeros = docs.map(_ => 0.0)
    val body = {
      val root = mapper.createObjectNode()
      root.put("model", model)
      root.put("query", query)
      val arr = root.putArray("documents")
      docs.foreach(arr.add)
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
        if (resp.statusCode() == 200) return parse(resp.body(), docs.length)
        if (resp.statusCode() < 500) return zeros
      } catch { case NonFatal(_) => () }
      attempt += 1
    }
    zeros
  }

  private def parse(body: String, n: Int): Seq[Double] = {
    val out = new Array[Double](n)
    try {
      val results = mapper.readTree(body).path("results")
      if (results.isArray) {
        results.forEach { node =>
          val i = node.path("index").asInt(-1)
          if (i >= 0 && i < n) out(i) = node.path("relevance_score").asDouble(0.0)
        }
      }
      out.toSeq
    } catch { case NonFatal(_) => new Array[Double](n).toSeq }
  }
}
