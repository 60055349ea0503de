package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class GramDedupSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("instance-level duplicate accounting across and within docs") {
    // n=3 grams. doc 0 owns the canonical "a b c" (pos 0) and repeats it
    // at pos 3 ("a b c a b c d" → grams: [a b c][b c a][c a b][a b c][b c d]).
    // doc 1 contains "a b c" once more plus unique grams.
    val docs = Seq(
      (0L, "a b c a b c d"),
      (1L, "x y a b c z w")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (5L, 1L), s"doc0: ${out(0L)}") // second "a b c" only
    assert(out(1L) == (5L, 1L), s"doc1: ${out(1L)}") // its "a b c" instance
  }

  test("excision removes every duplicate span instance but the globally first") {
    // n=3. [a b c] appears in doc 0 (pos 0, canonical by (id, pos)
    // order) and doc 1 (pos 3, flagged -> words 3..5 excised). Every
    // other gram is unique, so nothing else moves.
    val docs = Seq(
      (0L, "a b c q r s"),
      (1L, "x y z a b c"), // [a b c] repeat at pos 3 -> words 3..5 excised
      (2L, "u v w")        // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ("a b c q r s", 6L, 0L), s"canonical doc must keep all: ${out(0L)}")
    assert(out(1L) == ("x y z", 6L, 3L), s"dup span must be excised: ${out(1L)}")
    assert(out(2L) == ("u v w", 3L, 0L), s"untouched doc must pass through: ${out(2L)}")
  }

  test("excision: overlapping flagged spans cover their union; within-doc repeats count") {
    // one doc, n=2: "a b a b a b" — grams [a b](0) [b a](1) [a b](2)
    // [b a](3) [a b](4). First [a b] at 0 and first [b a] at 1 are
    // canonical; flagged: pos 2,3,4 (covering words 2..5). Survivors:
    // words 0..1 -> "a b".
    val docs = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(0L) == ("a b", 4L), s"overlap union wrong: ${out(0L)}")
  }

  test("excision agrees with the profile: removed instances == n_dup") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val profile = Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 5)
      .agg(org.apache.spark.sql.functions.sum("n_dup")).head().getLong(0)
    // flagged INSTANCES == profile n_dup by shared first-key order; the
    // excised-token count is bounded by n x instances (overlap unions)
    val removed = Dedup.exciseDuplicateSpans(docs, "doc_id", "text", n = 5)
      .agg(org.apache.spark.sql.functions.sum("n_removed")).head().getLong(0)
    assert(removed <= profile * 5, s"removed $removed exceeds 5x flagged $profile")
    assert((profile == 0L) == (removed == 0L),
      s"profile and excision must agree on whether duplication exists ($profile vs $removed)")
  }

  test("canonical ownership follows (doc_id, position) order") {
    // Identical docs: doc 5 owns every gram, doc 9's instances all dup.
    val docs = Seq((9L, "p q r s t"), (5L, "p q r s t")).toDF("doc_id", "text")
    val out = Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(5L) == (4L, 0L))
    assert(out(9L) == (4L, 4L))
    val frac = Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 2)
      .filter($"doc_id" === 9L).select("dup_fraction").as[Double].head()
    assert(frac == 1.0)
  }

  test("short docs gram to the whole doc (WordShingles contract)") {
    val docs = Seq((0L, "solo"), (1L, "solo")).toDF("doc_id", "text")
    val out = Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (1L, 0L) && out(1L) == (1L, 1L))
  }

  test("string ids take the struct order key and rank like the packed path") {
    // same corpus under long ids and under order-equivalent string ids:
    // the struct fallback must produce identical profiles
    val texts = Seq("a b c a b c d", "x y a b c z w", "p q r s t")
    val longDocs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val strDocs = texts.zipWithIndex.map { case (t, i) => (s"doc$i", t) }
      .toDF("doc_id", "text")
    val viaLong = Dedup.duplicatedGramProfile(longDocs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val viaStr = Dedup.duplicatedGramProfile(strDocs, "doc_id", "text", n = 3)
      .collect().map(r => r.getString(0).stripPrefix("doc") -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaStr == viaLong, s"string-id profile $viaStr != long-id $viaLong")
  }

  test("packed order key guards its width: out-of-range id raises") {
    val docs = Seq((1L << 50, "a b c")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("packed order key guards position width; struct path has no limit") {
    // a doc longer than 2^20 words: some gram's first position exceeds
    // the packed key's 20-bit position field
    val words = (0 until (1 << 20) + 8).map(i => s"w$i").mkString(" ")
    val longDoc = Seq((1L, words)).toDF("doc_id", "text")
    intercept[Exception] {
      Dedup.duplicatedGramProfile(longDoc, "doc_id", "text", n = 2).collect()
    }
    // string ids take the struct key — same doc profiles fine
    val viaStr = Dedup.duplicatedGramProfile(
        Seq(("doc1", words)).toDF("doc_id", "text"), "doc_id", "text", n = 2)
      .collect()
    assert(viaStr.length == 1 && viaStr(0).getLong(1) == (1 << 20) + 7)
  }

  test("gram-hash width is parameterizable; wider hash, same profile") {
    val docs = Seq(
      (0L, "a b c a b c d"),
      (1L, "x y a b c z w")
    ).toDF("doc_id", "text")
    def profile(w: Int) = Dedup.duplicatedGramProfile(docs, "doc_id", "text",
        n = 3, hashHexChars = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(profile(32) == profile(16), "full-md5 profile diverged from 64-bit prefix")
    intercept[IllegalArgumentException] {
      Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 3, hashHexChars = 33)
    }
  }

  test("shuffle carries distinct (gram, doc) rows: partial agg in plan") {
    val docs = Seq((0L, "a b c a b c d")).toDF("doc_id", "text")
    val plan = Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    // the first aggregate must run partial (map-side) before its Exchange
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
