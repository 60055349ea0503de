package graft.operators

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.util.control.NonFatal

/** Opt-in HTTP transport for the GENERATION stage — an
  * OpenAI-compatible chat-completions client with Server-Sent-Events
  * streaming, the real-service counterpart of the reference's LLM call
  * (`app/main.py:189-242` request shape; `:616-647` the streaming
  * variant whose deltas feed the per-token WS relay `:717-727`).
  *
  *  - [[generate]]: one blocking POST (`"stream": false`), returns the
  *    completed answer text; on ANY failure returns "" — the
  *    reference's `None`-on-LLM-failure sentinel (`:232-242`), so a
  *    flaky model degrades the ask, never crashes it.
  *  - [[generateStream]]: `"stream": true`, returns a LAZY
  *    Iterator[String] of content deltas parsed from the SSE lines
  *    (`data: {...choices[0].delta.content...}` until `data: [DONE]`)
  *    — tokens leave as they arrive, the shape
  *    [[graft.streaming.TokenEgress]] and the serving relay consume.
  *    Malformed events are skipped; a mid-stream transport error ends
  *    the iterator (partial answer, like a dropped WS).
  *
  * Driver-side by design: generation happens once per ask on the
  * serving path, not per row — so unlike the embed/rerank clients this
  * one is not a mapPartitions citizen. One HttpClient per instance;
  * opt-in (no default endpoint), Jackson from Spark's classpath. Wire
  * it with `AskPipeline.ask(..., generate = Some(client.generate))`.
  */
final class HttpGenerateClient(endpoint: String, model: String,
                               timeoutMs: Int = 60000,
                               maxTokens: Int = 512) {
  require(endpoint.startsWith("http://") || endpoint.startsWith("https://"),
    s"HttpGenerateClient endpoint must be an http(s) URL, got '$endpoint'")

  private val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs.toLong))
    .build()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def request(prompt: String, stream: Boolean): HttpRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("stream", stream)
    root.put("max_tokens", maxTokens)
    val msgs = root.putArray("messages")
    val m = msgs.addObject()
    m.put("role", "user")
    m.put("content", prompt)
    HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
      .build()
  }

  /** Blocking completion; "" on any failure (reference sentinel). */
  def generate(prompt: String): String = {
    try {
      val resp = http.send(request(prompt, stream = false),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) return ""
      val choices = mapper.readTree(resp.body()).path("choices")
      if (!choices.isArray || choices.size() == 0) return ""
      val c0 = choices.get(0)
      val content = c0.path("message").path("content")
      if (content.isTextual) content.asText() else c0.path("text").asText("")
    } catch { case NonFatal(_) => "" }
  }

  /** Lazy SSE token stream; empty iterator on connection failure,
    * truncated on mid-stream failure. Caller drains it fully (or the
    * connection is released when [DONE]/EOF ends it). */
  def generateStream(prompt: String): Iterator[String] = {
    val reader =
      try {
        val resp = http.send(request(prompt, stream = true),
          HttpResponse.BodyHandlers.ofInputStream())
        if (resp.statusCode() != 200) { resp.body().close(); return Iterator.empty }
        new BufferedReader(new InputStreamReader(resp.body(), StandardCharsets.UTF_8))
      } catch { case NonFatal(_) => return Iterator.empty }
    new Iterator[String] {
      private var nextTok: Option[String] = advance()
      private def advance(): Option[String] = {
        try {
          var line = reader.readLine()
          while (line != null) {
            if (line.startsWith("data:")) {
              val payload = line.stripPrefix("data:").trim
              if (payload == "[DONE]") { reader.close(); return None }
              try {
                val choices = mapper.readTree(payload).path("choices")
                if (choices.isArray && choices.size() > 0) {
                  val delta = choices.get(0).path("delta").path("content")
                  val tok = if (delta.isTextual) delta.asText()
                    else choices.get(0).path("text").asText("")
                  if (tok.nonEmpty) return Some(tok)
                }
              } catch { case NonFatal(_) => () } // skip malformed event
            }
            line = reader.readLine()
          }
          reader.close(); None
        } catch { case NonFatal(_) => try reader.close() catch { case NonFatal(_) => () }; None }
      }
      override def hasNext: Boolean = nextTok.isDefined
      override def next(): String = {
        val t = nextTok.getOrElse(throw new NoSuchElementException)
        nextTok = advance()
        t
      }
    }
  }
}
