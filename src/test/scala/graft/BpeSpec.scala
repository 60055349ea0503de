package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE tokenizer training/encoding: deterministic merge learning over
  * the word-type table, standard left-to-right merge application. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("mergeOnce fuses left-to-right, including overlap runs") {
    assert(Bpe.mergeOnce(IndexedSeq("a", "b", "a", "b"), "a", "b") ==
      IndexedSeq("ab", "ab"))
    // overlapping run aaa: the leftmost pair wins, the tail survives
    assert(Bpe.mergeOnce(IndexedSeq("a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "a"))
    assert(Bpe.mergeOnce(IndexedSeq("x"), "a", "b") == IndexedSeq("x"))
  }

  test("train learns the classic frequency-ordered merges") {
    // 'lo' dominates: low x5 + lower x2 + lowest x2 -> pair (l,o) count 9
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(2)("lowest"))
      .mkString(" ")
    val df = Seq(docs).toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 2)
    assert(merges.head == ("l", "o"), s"first merge: ${merges.head}")
    // second round: (lo,w) count 9 beats everything else
    assert(merges(1) == ("lo", "w"), s"second merge: ${merges(1)}")
  }

  test("train is deterministic and stops when no pair reaches minPairCount") {
    val df = Seq("aa bb aa cc aa").toDF("text")
    val m1 = Bpe.train(df, "text", numMerges = 10)
    assert(m1 == Bpe.train(df, "text", numMerges = 10))
    // 3 types of 2 chars each -> at most 3 distinct pairs; (a,a) x3 wins,
    // then (b,b)/(c,c) at 1 < minPairCount=2 stop the loop
    assert(m1 == Seq(("a", "a")))
    assert(Bpe.train(df, "text", numMerges = 0) == Seq.empty)
    intercept[IllegalArgumentException](Bpe.train(df, "text", numMerges = -1))
  }

  test("each merge strictly reduces the weighted symbol count") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(50)
    val merges = Bpe.train(df, "text", numMerges = 8)
    assert(merges.size == 8)
    val types = Bpe.wordCounts(df, "text").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def totalSyms(ms: Seq[(String, String)]): Long =
      types.map { case (w, n) => Bpe.encodeWord(w, ms).length * n }.sum
    val sizes = (0 to merges.size).map(k => totalSyms(merges.take(k)))
    sizes.sliding(2).foreach { case Seq(prev, next) =>
      assert(next < prev, s"merge did not reduce symbols: $sizes")
    }
  }

  test("encoding is lossless: concatenated tokens rebuild each word") {
    val df = Seq((1L, "The Quick brown fox"), (2L, ""), (3L, "fox fox"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 5, minPairCount = 1L)
    val out = Bpe.withBpeTokens(df, "text", "bpe", merges)
      .select("doc_id", "bpe").as[(Long, Seq[String])].collect().toMap
    assert(out(1L).mkString == "thequickbrownfox")
    assert(out(2L) == Seq.empty)
    assert(out(3L).mkString == "foxfox")
    // learned vocab actually compresses: 'fox' appears 3x -> merged
    assert(out(3L).length < 6, s"fox not compressed: ${out(3L)}")
  }

  test("maxTypes below |types| switches to the distributed-exact path: same merges") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(30)
    val nTypes = Bpe.wordCounts(df, "text").count()
    assert(nTypes > 5, s"corpus too small for the cap test: $nTypes types")
    // uncapped driver-side reference vs capped (forced distributed) run
    val driver = Bpe.train(df, "text", numMerges = 6)
    val distributed = Bpe.train(df, "text", numMerges = 6, maxTypes = 5)
    assert(distributed == driver,
      s"distributed-exact fallback learned different merges:\n  driver=$driver\n  dist=$distributed")
  }

  test("null text and STX/ETX control bytes are safe to encode") {
    val df = Seq((1L, "ab ab"), (2L, null), (3L, "a\u0002b \u0003\u0002 ab"))
      .toDF("doc_id", "text")
    val out = Bpe.withBpeTokens(df, "text", "bpe", Seq(("a", "b")))
      .select("doc_id", "bpe").as[(Long, Seq[String])].collect().toMap
    // null text encodes to zero tokens (no NPE), matching the oracle's
    // coalesce(n_tok, 0) shape
    assert(out(2L) == Seq.empty)
    // U+0002/U+0003 (the oracle's symbol brackets) are stripped at the
    // text level, so 'a<STX>b' merges exactly like 'ab'
    assert(out(1L) == Seq("ab", "ab"))
    assert(out(3L) == Seq("ab", "ab"))
  }

  test("end-to-end: learned-BPE token counts feed sequence packing") {
    import graft.operators.Sampling
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(100)
    val merges = Bpe.train(df, "text", numMerges = 20)
    val counted = Bpe.withBpeTokens(df, "text", "bpe", merges)
      .select(col("doc_id"), lit("corpus").as("strat"),
        size(col("bpe")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val packed = Sampling.packSequences(counted, "strat", "doc_id", "n_tokens", seqLen = 128L)
    // spans cover every doc's tokens exactly once
    val spanTotal = packed
      .agg(sum(col("tok_end") - col("tok_begin"))).head().getLong(0)
    val tokTotal = counted.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(spanTotal == tokTotal,
      s"packed spans ($spanTotal) must tile the BPE token count ($tokTotal)")
  }

  test("real-corpus merges compress the corpus tokenization") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 30)
    val enc = Bpe.withBpeTokens(df, "text", "bpe", merges)
    val (nTok, nChar) = enc.select(
        sum(size(col("bpe"))).cast("long"),
        sum(length(regexp_replace(lower(col("text")), "\\s+", ""))).cast("long"))
      .as[(Long, Long)].head()
    assert(nTok < nChar,
      s"30 merges should compress below char-level: $nTok tokens vs $nChar chars")
    // every emitted token is in the learned vocab closure (chars + merges)
    val vocab = merges.map { case (a, b) => a + b }.toSet
    val sample = enc.select(explode(col("bpe"))).distinct().as[String].collect()
    sample.filter(_.length > 1).foreach { t =>
      assert(vocab.contains(t), s"token '$t' is multi-char but not a learned merge")
    }
  }
}
