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

  test("staleCheck=refuse answers 503 once the graph snapshot goes stale; log serves on") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_askstale").toString
    val h = operators.GraphIndex.build(spark, index, Seq("doc_id", "chunk_idx"),
      "embedding", dir, nCentroids = 2, m = 4, nBuckets = 4, beamWidth = 8, hops = 2)
    def delete(n: Int): Unit = {
      val victim = index.select("doc_id", "chunk_idx")
        .orderBy("doc_id", "chunk_idx").as[(Long, Int)].collect()(n)
      operators.GraphIndex.delete(spark, h,
        Seq(victim).toDF("doc_id", "chunk_idx"), Seq("doc_id", "chunk_idx"))
    }
    val hot0 = operators.GraphIndex.hot(spark, h)
    val srv0 = new AskServer(spark, index, graph = Some(hot0), staleCheck = "refuse")
    val p0 = srv0.start()
    try {
      assert(post(p0, "/ask", """{"query":"broadcast join tables"}""").statusCode() == 200)
      delete(0)
      val stale = post(p0, "/ask", """{"query":"broadcast join tables"}""")
      assert(stale.statusCode() == 503, s"${stale.statusCode()} ${stale.body()}")
      assert(stale.body().contains("stale"), stale.body())
    } finally { srv0.stop(); hot0.cool() }
    // the log posture keeps serving the point-in-time snapshot
    val hot1 = operators.GraphIndex.hot(spark, h)
    val srv1 = new AskServer(spark, index, graph = Some(hot1), staleCheck = "log")
    val p1 = srv1.start()
    try {
      delete(1)
      assert(hot1.isStale(spark))
      assert(post(p1, "/ask", """{"query":"broadcast join tables"}""").statusCode() == 200)
    } finally { srv1.stop(); hot1.cool() }
  }

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

  test("failed generation: error answer, nothing cached, no memory turn") {
    // hook fails (empty answer) once, then recovers — the failure must
    // not be served as a later cache hit and must not become a history turn
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = new AskServer(spark, index,
      generate = Some(_ => if (calls.incrementAndGet() == 1) "" else "real answer"))
    val port = srv.start()
    try {
      val q = """{"chat_id":"f0","query":"broadcast join tables"}"""
      val r1 = mapper.readTree(post(port, "/ask", q).body())
      assert(r1.path("answer").asText() == graft.operators.AskPipeline.NoResponseAnswer)
      assert(r1.path("answer").asText() == "Error: No response was generated. Please try later!",
        "must be the reference's verbatim error string (app/main.py:541)")
      assert(!r1.path("from_cache").asBoolean(true))
      val r2 = mapper.readTree(post(port, "/ask", q).body())
      assert(!r2.path("from_cache").asBoolean(true),
        "the failed answer must not have seeded the cache")
      assert(r2.path("answer").asText() == "real answer")
      assert(r2.path("n_history_turns").asInt(-1) == 0,
        "a failed ask must not append a conversation turn")
      val r3 = mapper.readTree(post(port, "/ask", q).body())
      assert(r3.path("from_cache").asBoolean(false), "the real answer caches normally")
      assert(r3.path("n_history_turns").asInt(-1) == 1)
    } finally srv.stop()
  }

  test("failed STREAMING generation is visible on /ask/stream: error answer relayed, not a bare done") {
    // HttpGenerateClient degrades to an EMPTY stream on any transport
    // failure — the stream client must still read the error answer
    // (token relay of NoResponseAnswer), never a token-less done:true
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = new AskServer(spark, index,
      generateStream = Some(_ =>
        if (calls.incrementAndGet() == 1) Iterator.empty
        else Iterator("recovered ", "answer")))
    val port = srv.start()
    try {
      val q = """{"chat_id":"sf0","query":"broadcast join tables"}"""
      val lines1 = post(port, "/ask/stream", q).body().trim.split("\n").toSeq
      val toks1 = lines1.filter(_.contains("\"token\""))
        .map(l => mapper.readTree(l).path("token").asText()).mkString
      assert(toks1 == graft.operators.AskPipeline.NoResponseAnswer,
        s"failed stream must relay the error answer, got: $lines1")
      // and the failure did not poison the cache: the retry generates
      val lines2 = post(port, "/ask/stream", q).body().trim.split("\n").toSeq
      val toks2 = lines2.filter(_.contains("\"token\""))
        .map(l => mapper.readTree(l).path("token").asText()).mkString
      assert(toks2 == "recovered answer", s"got: $lines2")
      assert(mapper.readTree(lines2.last).path("from_cache").asBoolean(true) == false)
    } finally srv.stop()
  }

  test("WS fragmented text message (FIN=0 + continuation) is assembled and answered") {
    val srv = new AskServer(spark, index)
    srv.start()
    val wsPort = srv.wsStart()
    try {
      val sock = new java.net.Socket("127.0.0.1", wsPort)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        sock.getInputStream, java.nio.charset.StandardCharsets.ISO_8859_1))
      // handshake
      out.write(("GET /ws/ask HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("ISO-8859-1"))
      out.flush()
      var line = in.readLine()
      assert(line != null && line.contains("101"), s"handshake failed: $line")
      while (line != null && line.nonEmpty) line = in.readLine()
      // masked client frames: text FIN=0 with the first half, then
      // continuation FIN=1 with the rest
      def frame(opcode: Int, fin: Boolean, payload: Array[Byte]): Array[Byte] = {
        val mask = Array[Byte](0x11, 0x22, 0x33, 0x44)
        val b = new scala.collection.mutable.ArrayBuffer[Byte]()
        b += ((if (fin) 0x80 else 0x00) | opcode).toByte
        assert(payload.length < 126)
        b += (0x80 | payload.length).toByte
        b ++= mask
        payload.indices.foreach(i => b += (payload(i) ^ mask(i % 4)).toByte)
        b.toArray
      }
      val msg = """{"chat_id":"wf0","query":"broadcast join tables"}"""
        .getBytes("UTF-8")
      val (h1, h2) = msg.splitAt(msg.length / 2)
      out.write(frame(0x1, fin = false, h1))
      out.write(frame(0x0, fin = true, h2))
      out.flush()
      // read server frames until the done line arrives (unmasked, short)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      val seen = new StringBuilder
      val raw = sock.getInputStream
      var done = false
      while (!done && System.nanoTime() < deadline) {
        val b0 = raw.read(); val b1 = raw.read()
        assert(b0 >= 0 && b1 >= 0, s"server closed early after: $seen")
        val len = b1 & 0x7f
        assert(len < 126, "test frames are short")
        val payload = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = raw.read(payload, off, len - off); assert(r >= 0); off += r
        }
        val text = new String(payload, "UTF-8")
        seen.append(text).append('\n')
        if (text.contains("\"done\"") || text.contains("\"error\"")) done = true
      }
      assert(seen.toString.contains("\"done\":true"),
        s"fragmented message must be assembled and answered, got: $seen")
      assert(!seen.toString.contains("\"error\""),
        s"no error line expected, got: $seen")
      sock.close()
    } finally srv.stop()
  }

  test("generateStream-only: /ask answers from the SAME model as /ask/stream") {
    val srv = new AskServer(spark, index,
      generateStream = Some(_ => Iterator("model ", "answer")))
    val port = srv.start()
    try {
      // blocking endpoint first: it must drain the stream hook, not fall
      // back to the stub — otherwise the two endpoints cache different
      // answers for the same query
      val q = """{"chat_id":"m0","query":"cosine scoring vectors"}"""
      val r1 = mapper.readTree(post(port, "/ask", q).body())
      assert(r1.path("answer").asText() == "model answer")
      val lines = post(port, "/ask/stream", q).body().split("\n").filter(_.nonEmpty)
      assert(mapper.readTree(lines.last).path("from_cache").asBoolean(false),
        "stream repeat must hit the entry /ask cached")
      val rebuilt = lines.init.map(l => mapper.readTree(l).path("token").asText()).mkString
      assert(rebuilt == "model answer")
    } finally srv.stop()
  }

  test("/ask/stream failure after headers ends the stream with an error line") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = new AskServer(spark, index,
      generateStream = Some { _ =>
        if (calls.incrementAndGet() == 1)
          Iterator("one ") ++ { throw new RuntimeException("model exploded") }
        else Iterator("recovered")
      })
    val port = srv.start()
    try {
      val body = post(port, "/ask/stream",
        """{"chat_id":"e0","query":"shuffle file map task"}""").body()
      val lines = body.split("\n").filter(_.nonEmpty)
      val last = mapper.readTree(lines.last)
      assert(last.has("error"), s"stream must terminate with an error line, got: $body")
      assert(last.path("error").asText().contains("model exploded"))
      // the server survives, and the aborted ask cached nothing: the
      // recovered model's answer is generated fresh
      val r = mapper.readTree(post(port, "/ask",
        """{"chat_id":"e0","query":"shuffle file map task"}""").body())
      assert(r.path("answer").asText() == "recovered")
      assert(!r.path("from_cache").asBoolean(true))
    } finally srv.stop()
  }

  test("concurrent asks: all answered, effects merge, state stays consistent") {
    withServer { port =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val queries = Seq(
        "broadcast hash join planner", "cosine scoring of vectors",
        "shuffle files and reducers", "broadcast hash join planner",
        "cosine scoring of vectors", "shuffle files and reducers",
        "broadcast hash join planner", "cosine scoring of vectors")
      // 8 concurrent asks (3 distinct queries, duplicated) on one chat —
      // retrieval runs unlocked in parallel; effects merge serially
      val futs = queries.zipWithIndex.map { case (q, i) => Future {
        mapper.readTree(post(port, "/ask",
          s"""{"chat_id":"cc","query":${mapper.writeValueAsString(q)}}""").body())
      }}
      val rs = Await.result(Future.sequence(futs), 120.seconds)
      assert(rs.length == 8 && rs.forall(_.path("answer").asText().nonEmpty))
      // per-query answers agree across racers (hit or regenerated — the
      // pipeline is deterministic, so racing misses produce equal text)
      queries.distinct.foreach { q =>
        val answers = rs.zip(queries).filter(_._2 == q).map(_._1.path("answer").asText()).toSet
        assert(answers.size == 1, s"racing asks for '$q' diverged: $answers")
      }
      // the merged state serves hits now, and memory kept every turn
      // (bounded at historyTurns=5)
      val again = mapper.readTree(post(port, "/ask",
        """{"chat_id":"cc","query":"broadcast hash join planner"}""").body())
      assert(again.path("from_cache").asBoolean(false), "post-race repeat must be a hit")
      assert(again.path("n_history_turns").asInt(-1) == 5,
        "8 concurrent turns on one chat must leave the bounded window full")
    }
  }

  test("WS /ws/ask: real JDK WebSocket client — handshake, token relay, shared cache") {
    val srv = new AskServer(spark, index)
    srv.start()
    val wsPort = srv.wsStart()
    try {
      val msgs = new java.util.concurrent.LinkedBlockingQueue[String]()
      val listener = new java.net.http.WebSocket.Listener {
        private val sb = new StringBuilder
        override def onText(ws: java.net.http.WebSocket, data: CharSequence,
                            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          sb.append(data)
          if (last) { msgs.add(sb.toString); sb.setLength(0) }
          ws.request(1); null
        }
      }
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:$wsPort/ws/ask"), listener).join()
      def askWs(q: String): Seq[String] = {
        ws.sendText(s"""{"chat_id":"w0","query":${mapper.writeValueAsString(q)}}""", true)
        val got = scala.collection.mutable.ArrayBuffer.empty[String]
        var done = false
        while (!done) {
          val m = msgs.poll(60, java.util.concurrent.TimeUnit.SECONDS)
          assert(m != null, s"WS relay stalled; got so far: $got")
          got += m
          done = mapper.readTree(m).has("done") || mapper.readTree(m).has("error")
        }
        got.toSeq
      }
      // first ask: miss — token frames then done(from_cache=false)
      val first = askWs("broadcast hash join planner")
      val d1 = mapper.readTree(first.last)
      assert(!d1.path("from_cache").asBoolean(true))
      val answer = first.init.map(m => mapper.readTree(m).path("token").asText()).mkString
      assert(answer.nonEmpty)
      // second ask on the SAME connection: served from the shared cache
      val second = askWs("broadcast hash join planner")
      assert(mapper.readTree(second.last).path("from_cache").asBoolean(false))
      assert(second.init.map(m => mapper.readTree(m).path("token").asText()).mkString == answer)
      ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "bye").join()
      // the WS asks share serving state with HTTP: POST /ask hits the
      // same cache entry the WS miss created
      val r = mapper.readTree(post(srv.port, "/ask",
        """{"chat_id":"other","query":"broadcast hash join planner"}""").body())
      assert(r.path("from_cache").asBoolean(false), "HTTP must hit the WS-seeded cache")
      assert(r.path("answer").asText() == answer)
    } finally srv.stop()
  }

  test("WS demo loop spec-pinned: capacity-2 LFU evicts the cold entry, frequent one survives") {
    // the README serving loop PmcDemo runs live (miss → hit → miss →
    // miss+evict → evicted entry misses again), folded into the gate so
    // a serving regression can't silently break the reference's demo:
    // capacity 2, three distinct queries — the 3rd insert evicts the
    // least-frequently-used entry (q2, freq 1; q1 was re-asked to freq
    // 2), the evicted query misses on re-ask, and the frequent entry
    // keeps hitting through all of it
    val srv = new AskServer(spark, index, capacity = 2)
    srv.start()
    val wsPort = srv.wsStart()
    try {
      val msgs = new java.util.concurrent.LinkedBlockingQueue[String]()
      val listener = new java.net.http.WebSocket.Listener {
        private val sb = new StringBuilder
        override def onText(ws: java.net.http.WebSocket, data: CharSequence,
                            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          sb.append(data)
          if (last) { msgs.add(sb.toString); sb.setLength(0) }
          ws.request(1); null
        }
      }
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:$wsPort/ws/ask"), listener).join()
      def fromCache(q: String): Boolean = {
        ws.sendText(s"""{"chat_id":"demo","query":${mapper.writeValueAsString(q)}}""", true)
        var done: Option[Boolean] = None
        while (done.isEmpty) {
          val m = msgs.poll(60, java.util.concurrent.TimeUnit.SECONDS)
          assert(m != null, s"WS relay stalled on '$q'")
          val n = mapper.readTree(m)
          if (n.has("done") || n.has("error")) done = Some(n.path("from_cache").asBoolean(false))
        }
        done.get
      }
      val q1 = "broadcast hash join planner"
      val q2 = "cosine scoring normalized vectors"
      val q3 = "shuffle file map task reducers"
      assert(!fromCache(q1), "first distinct ask must miss")
      assert(fromCache(q1), "repeat must hit (freq -> 2)")
      assert(!fromCache(q2), "second distinct ask must miss (cache now full)")
      assert(!fromCache(q3), "third distinct ask must miss and evict the LFU entry")
      assert(!fromCache(q2), "evicted entry must miss again on re-ask")
      assert(fromCache(q1), "the frequent entry must survive every eviction")
      ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "bye").join()
      // WS ↔ HTTP shared state: the same loop's cache serves POST /ask
      val r = mapper.readTree(post(srv.port, "/ask",
        s"""{"chat_id":"other","query":${mapper.writeValueAsString(q1)}}""").body())
      assert(r.path("from_cache").asBoolean(false), "HTTP must hit the WS-seeded entry")
    } finally srv.stop()
  }

  test("residentCache server: miss -> hit -> capacity-2 eviction, same contract as the DataFrame medium") {
    // the r17 resident cache medium behind the live surface: the same
    // miss/hit/evict sequence the DataFrame-backed server serves, with
    // zero cache-probe/merge Spark jobs per request
    val srv = new AskServer(spark, index, capacity = 2, residentCache = true)
    val port = srv.start()
    try {
      def ask(q: String): com.fasterxml.jackson.databind.JsonNode =
        mapper.readTree(post(port, "/ask",
          s"""{"chat_id":"rc","query":${mapper.writeValueAsString(q)}}""").body())
      val q1 = "broadcast hash join planner"
      val r1 = ask(q1)
      assert(!r1.path("from_cache").asBoolean(true), "first ask must miss")
      assert(ask(q1).path("from_cache").asBoolean(false), "repeat must hit")
      assert(ask(q1).path("answer").asText() == r1.path("answer").asText())
      // two more distinct asks overflow capacity 2: q1 (freq 3) must
      // SURVIVE the LFU eviction, the newest freq-1 entry goes
      ask("vectors cosine scoring normalized")
      ask("shuffle file map task reducers")
      assert(ask(q1).path("from_cache").asBoolean(false),
        "the frequent entry must survive eviction")
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
