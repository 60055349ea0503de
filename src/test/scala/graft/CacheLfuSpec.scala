package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CacheLfu, Similarity}

/** LFU cache semantics pinned to the reference (app/main.py:67-128):
  * threshold-inclusive hit (= 0.96 IS a hit, :89), min-freq eviction with
  * ties to the newest entry (LPUSH newest-first list scan, :107-114),
  * capacity bound (:124-126). */
class CacheLfuSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def cacheDf(entries: (Long, Seq[Float], String, Int)*) =
    entries.toDF("entry_id", "embedding", "response", "freq")

  test("threshold is inclusive: sim == threshold is a hit") {
    // query equals entry -> sim 1.0; with threshold 1.0 must still hit
    val c = cacheDf((1L, Seq(1f, 0f), "r1", 1))
    val hit = Similarity.cacheLookup(c, "embedding", Seq(1.0, 0.0), threshold = 1.0)
    assert(hit.count() == 1)
  }

  test("below threshold is a miss") {
    val c = cacheDf((1L, Seq(1f, 0f), "r1", 1))
    val miss = Similarity.cacheLookup(c, "embedding", Seq(0.0, 1.0), threshold = 0.5)
    assert(miss.count() == 0)
  }

  test("lookup returns the argmax entry") {
    val c = cacheDf(
      (1L, Seq(1f, 0f), "exact", 1),
      (2L, Seq(1f, 1f), "diag", 1),
      (3L, Seq(0f, 1f), "orth", 1))
    val best = Similarity.cacheLookup(c, "embedding", Seq(1.0, 0.0), 0.5)
    assert(best.select("entry_id").as[Long].head() == 1L)
  }

  test("eviction victim is the newest (highest id) among min freq") {
    // mirrors the reference's newest-first Redis list scan: the first
    // strict minimum it keeps is the most recently inserted one
    val c = cacheDf(
      (5L, Seq(1f, 0f), "a", 2),
      (2L, Seq(0f, 1f), "b", 1),
      (9L, Seq(1f, 1f), "c", 1))
    assert(CacheLfu.evictionVictim(c).select("entry_id").as[Long].head() == 9L)
  }

  test("put at capacity evicts exactly the victim") {
    val c = cacheDf(
      (1L, Seq(1f, 0f), "a", 3),
      (2L, Seq(0f, 1f), "b", 1))
    val entry = cacheDf((10L, Seq(1f, 1f), "new", 1))
    val out = CacheLfu.put(c, entry, capacity = 2)
      .select("entry_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 10L))
  }

  test("put under capacity keeps everything") {
    val c = cacheDf((1L, Seq(1f, 0f), "a", 3))
    val out = CacheLfu.put(c, cacheDf((2L, Seq(0f, 1f), "b", 1)), capacity = 10)
    assert(out.count() == 2)
  }

  test("touch bumps only the hit row's freq") {
    val c = cacheDf(
      (1L, Seq(1f, 0f), "a", 1),
      (2L, Seq(0f, 1f), "b", 1))
    val out = CacheLfu.touch(c, Seq(1.0, 0.0), threshold = 0.9)
      .select("entry_id", "freq").as[(Long, Int)].collect().toMap
    assert(out(1L) == 2 && out(2L) == 1)
  }
}
