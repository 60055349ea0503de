package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different content about spark execution engines here"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps lowest id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("exact dedup ignores whitespace-only differences (clean first)") {
    val d = Seq((1L, "a b"), (2L, "a\nb")).toDF("doc_id", "text")
    // \n -> ' ' makes them identical
    assert(Dedup.exact(d, "doc_id", "text").count() == 1)
  }

  test("minhash signatures: identical docs get identical signatures") {
    val sigs = Dedup.withMinhashSignature(docs, "doc_id", "text", 3, 8)
      .select((col("doc_id") +: (0 until 8).map(k => col(s"sig_$k"))): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString).toSeq).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    // near-dup shares most signature entries
    val shared = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(shared >= 4, s"near-dup docs shared only $shared/8 minhashes")
  }

  test("minhash LSH candidates include the exact dup pair") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", 3, 8, 8)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)) && !pairs.contains((3L, 4L)))
  }

  test("jaccard pairs: dup pair scores 1.0, near-dup high, disjoint absent") {
    val blocked = docs.withColumn("blk", lit(1))
    val out = Dedup.jaccardPairs(blocked, "doc_id", "text", "blk", 3, 0.05)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) > 0.5)
    assert(!out.contains((1L, 4L)))
  }

  test("simhash pairs: exact dup at hamming 0, disjoint docs excluded") {
    val blocked = docs.withColumn("blk", lit(1))
    val pairs = Dedup.simhashPairs(blocked, "doc_id", "text", "blk", bits = 16, maxHamming = 6)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("simhash: identical docs equal, near-dups within small hamming distance") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(3L)) <= 6, s"near-dup hamming ${hamming(h(1L), h(3L))}")
    assert(h(1L) >= 0 && h(1L) <= 0xFFFFL)
  }

  test("contamination: bench n-gram overlap flags, disjoint docs clean") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "intro words then alpha beta gamma delta epsilon zeta tail"),
      (3L, "completely different tokens with no shared phrases at all"))
      .toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 1L)
    val flags = Dedup.contamination(corpus, bench, "doc_id", "text",
        shingleN = 3, minShared = 3)
      .select("doc_id", "bench_id", "shared")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(flags(1L) == 6L)      // self-overlap: all six 3-grams
    assert(flags(2L) == 4L)      // the four 3-grams of the shared 6-word run
    assert(!flags.contains(3L))  // disjoint doc untouched
  }

  test("clusters: components resolve to min reachable id, chains converge") {
    // components {1,2,3} (triangle-ish), {7,8}, and a 6-node CHAIN
    // 20-21-22-23-24-25 — the chain forces multi-round propagation
    // (diameter 5), not just the one-hop case
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (7L, 8L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(7L) == 7L && got(8L) == 7L)
    (20L to 25L).foreach(id => assert(got(id) == 20L, s"chain node $id"))
    assert(got.size == 11) // only ids that appear in pairs
  }

  test("incremental dedup: corpus wins, then lowest batch id, then new") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq((0L, "seen before"), (1L, "also seen")).toDF("doc_id", "text")
    val existing = Dedup.exact(corpus, "doc_id", "text").select("fingerprint")
    val batch = Seq(
      (10L, "seen before"),   // dup_corpus (despite being batch-first)
      (11L, "brand new"),     // new
      (12L, "brand new"),     // dup_batch of 11
      (13L, "seen before"),   // dup_corpus (not dup_batch: corpus wins)
      (14L, "other new")      // new
    ).toDF("doc_id", "text")
    val got = Dedup.exactIncrement(batch, "doc_id", "text", existing)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "dup_corpus", 11L -> "new", 12L -> "dup_batch",
      13L -> "dup_corpus", 14L -> "new"))
    // appending the 'new' rows and re-running flags everything dup_corpus
    val appended = existing.unionByName(
      Dedup.exactIncrement(batch, "doc_id", "text", existing)
        .filter(col("status") === "new").select("fingerprint"))
    val rerun = Dedup.exactIncrement(batch, "doc_id", "text", appended)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(rerun.values.forall(_ == "dup_corpus"), s"rerun: $rerun")
  }

  test("incremental near-dup: corpus band index wins, then lower batch id, then new") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark execution engines here"))
      .toDF("doc_id", "text")
    val corpusBands = Dedup.lshBands(
      Dedup.withMinhashSignature(corpus, "doc_id", "text", 3, 8), "doc_id", 8, 8)
      .select(col("band_id"), col("bucket"), col("doc_id").as("id"))
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again"), // dup_corpus of 0
      (13L, "a wholly novel passage with fresh unrepeated vocabulary choices"), // new
      (15L, "a wholly novel passage with fresh unrepeated vocabulary choices"), // dup_batch of 13
      (17L, "   "))                                            // no shingles → new, never dropped
      .toDF("doc_id", "text")
    val got = Dedup.minhashIncrement(batch, "doc_id", "text", corpusBands,
        shingleN = 3, numHashes = 8, bands = 8)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(11L -> "dup_corpus", 13L -> "new",
      15L -> "dup_batch", 17L -> "new"), s"got $got")
    // appending the new docs' bands and re-running flags them dup_corpus
    val newIds = got.filter(_._2 == "new").keySet.toSeq
    val grown = corpusBands.unionByName(
      Dedup.lshBands(
        Dedup.withMinhashSignature(batch.filter(col("doc_id").isin(newIds: _*)),
          "doc_id", "text", 3, 8), "doc_id", 8, 8)
        .select(col("band_id"), col("bucket"), col("doc_id").as("id")))
    val rerun = Dedup.minhashIncrement(batch, "doc_id", "text", grown,
        shingleN = 3, numHashes = 8, bands = 8)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(rerun(13L) == "dup_corpus" && rerun(15L) == "dup_corpus")
    assert(rerun(17L) == "new", "blank docs never enter the band index")
  }

  test("incremental near-dup: an index with out-of-range band ids is rejected at run time") {
    // an index built with MORE bands than this probe uses (band_id 0..7
    // vs bands=4) can never collide — silent all-`new` corruption; the
    // probe's range guard must raise instead
    val corpus = Seq((0L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val wideIdx = Dedup.lshBands(
      Dedup.withMinhashSignature(corpus, "doc_id", "text", 3, 8), "doc_id", 8, 8)
      .select(col("band_id"), col("bucket"), col("doc_id").as("id"))
    val batch = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.minhashIncrement(batch, "doc_id", "text", wideIdx,
        shingleN = 3, numHashes = 8, bands = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("different")), s"got: ${messages(e)}")
  }

  test("incremental dedup: null-text rows are never dropped from the audit") {
    val corpus = Seq((0L, "seen before")).toDF("doc_id", "text")
    val existing = Dedup.exact(corpus, "doc_id", "text").select("fingerprint")
    val batch = Seq(
      (10L, "seen before"),
      (11L, null.asInstanceOf[String]), // null text → null fingerprint
      (12L, null.asInstanceOf[String]), // second null: dup_batch of 11
      (13L, "brand new")
    ).toDF("doc_id", "text")
    val got = Dedup.exactIncrement(batch, "doc_id", "text", existing)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    // every input row appears; nulls form ONE group (like exact's null
    // groupBy key), first null canonical, later nulls dup_batch
    assert(got == Map(10L -> "dup_corpus", 11L -> "new",
      12L -> "dup_batch", 13L -> "new"), s"got $got")
    // and once the null fingerprint is in the index, nulls are dup_corpus
    val appended = existing.unionByName(
      Dedup.exactIncrement(batch, "doc_id", "text", existing)
        .filter(col("status") === "new").select("fingerprint"))
    val rerun = Dedup.exactIncrement(batch, "doc_id", "text", appended)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(rerun.values.forall(_ == "dup_corpus"), s"rerun: $rerun")
  }

  test("materialize strategies agree: persist(DISK_ONLY) == localCheckpoint results") {
    val blocked = docs.withColumn("blk", lit(1))
    def run(): (Set[(Long, Long)], Set[(Long, Long)]) = (
      Dedup.minhashCandidates(docs, "doc_id", "text", 3, 8, 4)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet,
      Dedup.jaccardPairs(blocked, "doc_id", "text", "blk", 3, 0.05, maxDf = 100L)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet)
    val viaCheckpoint = run()
    spark.conf.set(Materialize.ConfKey, "persist")
    try {
      val viaPersist = run()
      assert(viaPersist == viaCheckpoint)
    } finally spark.conf.unset(Materialize.ConfKey)
  }
}
