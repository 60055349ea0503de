package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embed, Ingest}

/** Live-socket spec for [[AskServer]]: real HTTP round-trips against a
  * loopback server over a small embedded index — the reference's
  * POST /ask contract (query in, answer out), the evolving LFU cache
  * observable as from_cache on a repeat ask, per-chat conversation
  * memory, the NDJSON token relay, and input validation. */
class AskServerSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private val mapper = new ObjectMapper()
  private lazy val http = HttpClient.newHttpClient()

  private lazy val index = {
    import spark.implicits._
    val docs = Seq(
      (1L, "the planner chooses a broadcast hash join for small tables"),
      (2L, "vectors are normalized before the cosine scoring step runs"),
      (3L, "the shuffle file is written per map task and fetched by reducers"))
      .toDF("doc_id", "text")
    Materialize(Embed.withEmbedding(
      Ingest.chunk(docs.filter(Ingest.nonBlank(col("text"))), "text", 8)
        .select("doc_id", "chunk_idx", "chunk_text"),
      "chunk_text", "embedding"))
  }

  private def withServer(f: Int => Unit): Unit = {
    val srv = new AskServer(spark, index)
    val port = srv.start()
    try f(port) finally srv.stop()
  }

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /ask answers; an identical repeat is served from the evolving cache") {
    withServer { port =>
      val q = """{"chat_id":"c0","query":"broadcast hash join planner"}"""
      val r1 = mapper.readTree(post(port, "/ask", q).body())
      assert(r1.path("query").asText() == "broadcast hash join planner")
      assert(r1.path("answer").asText().nonEmpty)
      assert(!r1.path("from_cache").asBoolean(true), "first ask must be a miss")
      val r2 = mapper.readTree(post(port, "/ask", q).body())
      assert(r2.path("from_cache").asBoolean(false), "repeat ask must hit the cache")
      assert(r2.path("answer").asText() == r1.path("answer").asText())
    }
  }

  test("conversation memory: turns accumulate per chat_id, isolated across chats") {
    withServer { port =>
      def turns(chat: String, q: String): Int =
        mapper.readTree(post(port, "/ask",
          s"""{"chat_id":"$chat","query":${mapper.writeValueAsString(q)}}""").body())
          .path("n_history_turns").asInt(-1)
      assert(turns("cA", "cosine scoring of vectors") == 0)
      assert(turns("cA", "shuffle files and reducers") == 1)
      assert(turns("cA", "planner and small tables") == 2)
      assert(turns("cB", "cosine scoring of vectors") == 0, "chats are isolated")
    }
  }

  test("POST /ask/stream relays the answer as NDJSON tokens ending in done:true") {
    withServer { port =>
      val q = """{"chat_id":"s0","query":"shuffle file map task"}"""
      val ask = mapper.readTree(post(port, "/ask", q).body()).path("answer").asText()
      val lines = post(port, "/ask/stream", q).body().split("\n").filter(_.nonEmpty)
      val last = mapper.readTree(lines.last)
      assert(last.path("done").asBoolean(false), s"missing done line: ${lines.last}")
      assert(last.path("from_cache").asBoolean(false), "same query: relay serves the cached answer")
      val rebuilt = lines.init.map(l => mapper.readTree(l).path("token").asText()).mkString
      assert(rebuilt == ask, s"token concat != answer:\n'$rebuilt'\n'$ask'")
    }
  }

  test("generateStream hook: miss-path tokens relay the MODEL's deltas; cached repeat relays the stored answer") {
    val deltas = Seq("alpha ", "beta ", "gamma")
    // the hook runs at the pipeline's LLM call site and receives the
    // full prompt — assert that contract while we're here
    @volatile var seenPrompt: String = null
    val srv = new AskServer(spark, index,
      generateStream = Some { p => seenPrompt = p; deltas.iterator })
    val port = srv.start()
    try {
      val q = """{"chat_id":"g0","query":"broadcast join tables"}"""
      val lines = post(port, "/ask/stream", q).body().split("\n").filter(_.nonEmpty)
      val toks = lines.init.map(l => mapper.readTree(l).path("token").asText()).toSeq
      assert(toks == deltas, s"live relay must emit the model's own deltas: $toks")
      assert(!mapper.readTree(lines.last).path("from_cache").asBoolean(true))
      assert(seenPrompt != null && seenPrompt.contains("broadcast join tables") &&
        seenPrompt.contains("Context:"), s"hook must receive the full prompt:\n$seenPrompt")
      // the accumulated stream IS the cached answer: the repeat is a
      // hit and relays the stored text (split per word, not per delta)
      val again = post(port, "/ask/stream", q).body().split("\n").filter(_.nonEmpty)
      assert(mapper.readTree(again.last).path("from_cache").asBoolean(false))
      val rebuilt = again.init.map(l => mapper.readTree(l).path("token").asText()).mkString
      assert(rebuilt == deltas.mkString, s"cached relay must replay the accumulated answer: '$rebuilt'")
    } finally srv.stop()
  }

  test("validation: missing query is a 400, not a crash") {
    withServer { port =>
      val r = post(port, "/ask", """{"chat_id":"x"}""")
      assert(r.statusCode() == 400, s"got ${r.statusCode()}: ${r.body()}")
      assert(r.body().contains("query"))
    }
  }
}
