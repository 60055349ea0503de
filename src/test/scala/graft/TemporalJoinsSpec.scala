package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** Backward as-of join (union+window, join-free plan) and bin-bucketed
  * point-in-interval range join (equi-join plan, no nested loop) —
  * result parity against naive forms plus the plan-shape pins. */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  // (key, ts, id) quotes and trades with planted edge cases:
  //  - trade exactly AT a quote ts (inclusive semantics)
  //  - trade before any quote (null payload)
  //  - key with no quotes at all
  private val quotes = Seq(
    (1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0), (1L, 300L, 12L, 3.0),
    (2L, 150L, 20L, 5.0)
  ).toDF("k", "ts", "qid", "px")

  private val trades = Seq(
    (1L, 50L, 900L),  // before all quotes -> null
    (1L, 100L, 901L), // exactly at quote 10 -> inclusive hit
    (1L, 250L, 902L), // between 200 and 300 -> quote 11
    (1L, 999L, 903L), // after all -> quote 12
    (2L, 149L, 904L), // just before key-2's only quote -> null
    (2L, 150L, 905L), // at it -> quote 20
    (3L, 500L, 906L)  // key with no quotes -> null
  ).toDF("k", "ts", "tid")

  test("asofBackward: backward-inclusive semantics with nulls where no match") {
    val out = TemporalJoins.asofBackward(trades, quotes, Seq("k"), "ts", Seq("qid", "px"))
      .select("tid", "qid", "px").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out == Map(900L -> null, 901L -> 10L, 902L -> 11L, 903L -> 12L,
      904L -> null, 905L -> 20L, 906L -> null))
  }

  test("asofBackward matches the naive join+argmax form") {
    val naive = trades.as("t")
      .join(quotes.as("q"), $"t.k" === $"q.k" && $"q.ts" <= $"t.ts", "left")
      .groupBy($"t.tid")
      .agg(max_by(struct($"q.qid", $"q.px"), struct($"q.ts", $"q.qid")).as("m"))
      .select($"tid", $"m.qid".as("qid"))
    val fast = TemporalJoins.asofBackward(trades, quotes, Seq("k"), "ts", Seq("qid", "px"))
      .select("tid", "qid")
    assert(fast.orderBy("tid").collect().toSeq == naive.orderBy("tid").collect().toSeq)
  }

  test("asofBackward plan is join-free (single keyed window, no join explosion)") {
    val p = plan(TemporalJoins.asofBackward(trades, quotes, Seq("k"), "ts", Seq("qid")))
    assert(!p.contains("Join"), s"unexpected join operator in as-of plan:\n$p")
    assert(p.contains("Window"), s"expected window operator in as-of plan:\n$p")
  }

  private val intervals = Seq(
    (1L, 100L, 300L, 70L),  // spans three 100-bins (1,2,3)
    (1L, 250L, 260L, 71L),  // inside one bin
    (2L, 0L, 1000L, 72L)    // long interval, many bins
  ).toDF("k", "s", "e", "iid")

  private val points = Seq(
    (1L, 100L, 800L), // exactly at a start (inclusive)
    (1L, 300L, 801L), // exactly at an end (inclusive)
    (1L, 301L, 802L), // one past the end -> only misses
    (1L, 255L, 803L), // inside both key-1 intervals
    (2L, 500L, 804L), // inside the long interval
    (3L, 500L, 805L)  // key with no intervals
  ).toDF("k", "p", "pid")

  test("pointInInterval matches the naive range-condition join, ends inclusive") {
    val naive = points.as("p")
      .join(intervals.as("i"), $"p.k" === $"i.k" && $"p.p" >= $"i.s" && $"p.p" <= $"i.e")
      .select($"pid", $"iid")
    // bin sizes smaller, equal, larger than interval lengths must all agree
    for (bin <- Seq(7L, 100L, 5000L)) {
      val fast = TemporalJoins.pointInInterval(points, intervals, Seq("k"), "p", "s", "e", bin)
        .select("pid", "iid")
      assert(fast.orderBy("pid", "iid").collect().toSeq ==
        naive.orderBy("pid", "iid").collect().toSeq, s"bin=$bin")
    }
  }

  test("pointInInterval expected pair set on planted edges") {
    val got = TemporalJoins.pointInInterval(points, intervals, Seq("k"), "p", "s", "e", 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((800L, 70L), (801L, 70L), (803L, 70L), (803L, 71L), (804L, 72L)))
  }

  test("pointInInterval plans as an equi-join, not a nested loop") {
    val p = plan(TemporalJoins.pointInInterval(points, intervals, Seq("k"), "p", "s", "e", 100L))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"range join fell back to a nested loop:\n$p")
    assert(p.contains("Join"), s"expected an equi-join in:\n$p")
  }
}
