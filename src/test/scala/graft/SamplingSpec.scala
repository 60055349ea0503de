package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("hash sample: deterministic, rate-accurate, append-stable") {
    val ids = spark.range(0, 10000).toDF("id")
    val kept = Sampling.hashSample(ids, "id", 0.25)
      .as[Long].collect().toSet
    // rate accuracy: md5 uniformity at n=10000 (±4σ ≈ ±173)
    assert(math.abs(kept.size - 2500) < 200, s"kept ${kept.size}")
    // deterministic: identical on recomputation
    val again = Sampling.hashSample(ids, "id", 0.25).as[Long].collect().toSet
    assert(again == kept)
    // append-stable: sampling a prefix gives exactly the prefix's subset —
    // growing the corpus never flips earlier keep/drop decisions
    val prefix = Sampling.hashSample(spark.range(0, 5000).toDF("id"), "id", 0.25)
      .as[Long].collect().toSet
    assert(prefix == kept.filter(_ < 5000))
  }

  test("stratified rates apply per stratum; unlisted strata drop") {
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("s", concat(lit("s"), pmod(col("id"), lit(3))))
    val out = Sampling.stratifiedHashSample(df, "id", "s",
        Map("s0" -> 1.0, "s1" -> 0.2))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(out("s0") == 1000)              // rate 1.0 keeps everything
    assert(out("s1") > 100 && out("s1") < 300) // ~200
    assert(!out.contains("s2"))            // unlisted stratum dropped
  }

  test("leakproof split: near-dup cluster members land in the same split") {
    // clusters {1,2,3} and {10,11}; 20, 21 singletons
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakproofSplit(docs, "doc_id", pairs, valFraction = 0.5)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 7, "no input doc may vanish")
    // whole clusters move together
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(1L)._1 == 1L)
    assert(Set(out(10L), out(11L)).size == 1)
    assert(out(10L)._1 == 10L)
    // singletons are their own cluster and split by their own id —
    // identical decision to a plain hash split
    assert(out(20L)._1 == 20L && out(21L)._1 == 21L)
    val u20 = docs.filter(col("doc_id") === 20L)
      .select(Sampling.uniformByHash(col("doc_id"))).head().getDouble(0)
    assert(out(20L)._2 == (if (u20 < 0.5) "val" else "train"))
  }

  test("temperature mix: sqrt allocation, exact quotas, prefix-monotone") {
    // strata of 100 / 400 / 900 docs: sqrt weights 10/20/30 → budget 60
    // splits 10/20/30 exactly
    val df = spark.range(0, 1400).toDF("id")
      .withColumn("s",
        when(col("id") < 100, "small")
          .when(col("id") < 500, "mid")
          .otherwise("big"))
    val kept = Sampling.temperatureMix(df, "id", "s", budget = 60L)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(kept == Map("small" -> 10L, "mid" -> 20L, "big" -> 30L), s"got $kept")
    // α = 1 is proportional: 100/1400, 400/1400, 900/1400 of 140
    val prop = Sampling.temperatureMix(df, "id", "s", budget = 140L, alpha = 1.0)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(prop == Map("small" -> 10L, "mid" -> 40L, "big" -> 90L), s"got $prop")
    // prefix-monotone: a bigger budget only ADDS docs, never swaps one
    def ids(b: Long) = Sampling.temperatureMix(df, "id", "s", budget = b)
      .select("id").as[Long].collect().toSet
    val (small, large) = (ids(60L), ids(120L))
    assert(small.subsetOf(large), "growing the budget must only add documents")
    // a stratum's quota never exceeds its size
    val tiny = Sampling.temperatureMix(df.filter(col("s") =!= "big"), "id", "s",
      budget = 5000L).groupBy("s").count().as[(String, Long)].collect().toMap
    assert(tiny("small") <= 100L && tiny("mid") <= 400L)
  }

  test("packSequences: spans tile sequences exactly and cover every doc") {
    val rng = new scala.util.Random(11)
    val docs = (0 until 500)
      .map(i => (i.toLong, s"s${i % 3}", rng.nextInt(700).toLong))
      .toDF("id", "strat", "toks")
    val L = 256L
    val out = Sampling.packSequences(docs, "strat", "id", "toks", L)
      .select("strat", "id", "seq_id", "tok_begin", "tok_end", "doc_tok_begin")
      .as[(String, Long, Long, Long, Long, Long)].collect()

    // every doc's spans sum to its token count and chain within the doc
    val byDoc = out.groupBy(d => (d._1, d._2))
    val toks = docs.filter($"toks" > 0)
      .select("strat", "id", "toks").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    for ((k, spans) <- byDoc) {
      assert(spans.map(s => s._5 - s._4).sum == toks(k), s"doc $k coverage")
      val ordered = spans.sortBy(_._3)
      assert(ordered.map(_._6).toSeq ==
        ordered.scanLeft(0L)((acc, s) => acc + (s._5 - s._4)).init.toSeq,
        s"doc $k in-doc offsets must chain")
    }
    // every sequence is tiled [0, L) with no gaps/overlaps; the last
    // sequence of a stratum may end short
    for (((strat, seq), spans) <- out.groupBy(s => (s._1, s._3))) {
      val ordered = spans.sortBy(_._4).toSeq
      assert(ordered.head._4 == 0L, s"$strat/$seq starts at 0")
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 == b._4, s"$strat/$seq gap at ${a._5}")
        case _ =>
      }
      val maxSeq = out.filter(_._1 == strat).map(_._3).max
      if (seq != maxSeq)
        assert(ordered.last._5 == L, s"$strat/$seq must fill to $L")
    }
    // total span mass = total tokens
    assert(out.map(s => s._5 - s._4).sum == toks.values.sum)
  }

  test("property: packShards invariants hold over seeded random layouts") {
    val rng = new scala.util.Random(7)
    // one DataFrame per budget, batched — invariants checked per stratum
    (0 until 5).foreach { trial =>
      val budget = 200L + rng.nextInt(1800)
      val rows = (0 until 400).map { i =>
        (i.toLong, s"s${i % 3}", (1 + rng.nextInt(600)).toLong)
      }
      val packed = Sampling.packShards(
          rows.toDF("id", "strat", "toks"), "strat", "id", "toks", budget)
        .select("strat", "id", "toks", "shard_id")
        .as[(String, Long, Long, Long)].collect()
      packed.groupBy(_._1).foreach { case (_, rs) =>
        val ordered = rs.sortBy(_._2)
        // exact defining property: shard = floor(tokens-before / budget)
        var cum = 0L
        ordered.foreach { case (_, _, toks, shard) =>
          assert(shard == cum / budget, s"trial $trial budget $budget")
          cum += toks
        }
      }
    }
  }

  test("packShardsBucketed ≡ packShards for any bucket size (incl. misaligned)") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 600).map { i =>
      (i.toLong, s"s${i % 2}", (1 + rng.nextInt(500)).toLong)
    }
    val df = rows.toDF("id", "strat", "toks")
    val single = Sampling.packShards(df, "strat", "id", "toks", 1000L)
      .select("strat", "id", "shard_id").as[(String, Long, Long)].collect().sorted.toSeq
    // bucket sizes deliberately misaligned with shard boundaries: the
    // bucket-prefix offset makes the equivalence exact, not approximate
    Seq(1L, 7L, 16L, 100L, 10000L).foreach { bucketRows =>
      val bucketed = Sampling.packShardsBucketed(df, "strat", "id", "toks", 1000L, bucketRows)
        .select("strat", "id", "shard_id").as[(String, Long, Long)].collect().sorted.toSeq
      assert(bucketed == single, s"bucketRows=$bucketRows diverged from single-window packing")
    }
  }

  test("packShardsBucketed runs one window per bucket, not per stratum") {
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("s", lit("one"))           // ONE stratum — the hard case
      .withColumn("toks", lit(10L))
    val packed = Sampling.packShardsBucketed(df, "s", "id", "toks", 500L, bucketRows = 100L)
    // the row-level window partitions by (stratum, bucket): 20 concurrent
    // window partitions instead of 1 — visible as _bucket in the plan's
    // window partition spec
    val p = packed.queryExecution.executedPlan.toString
    assert(p.contains("_bucket"), s"expected bucket-partitioned window:\n$p")
    // and the ids still pack exactly as the single window would
    val single = Sampling.packShards(df, "s", "id", "toks", 500L)
      .select("id", "shard_id").as[(Long, Long)].collect().sorted.toSeq
    val got = packed.select("id", "shard_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == single)
  }

  test("shuffleShards: a reproducible, partitioning-proof permutation into dense shards") {
    val docs = spark.range(0, 500).toDF("id")
    val out = Sampling.shuffleShards(docs, "id", nShards = 8, salt = "ep0")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    // permutation: every id exactly once, shards in range
    assert(out.map(_._1).sorted == (0L until 500L))
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // dense in-shard positions 1..n, no gaps or collisions
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size), s"shard $sh positions not dense")
    }
    // every shard is genuinely used at n=500, and not too lopsided
    val sizes = out.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.size == 8)
    assert(sizes.values.min > 20, s"suspiciously skewed shards: $sizes")
    // reproducible regardless of input partitioning
    val repart = Sampling.shuffleShards(docs.repartition(13), "id", 8, "ep0")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(repart.toSet == out.toSet)
    // a different salt is a genuinely different permutation
    val ep1 = Sampling.shuffleShards(docs, "id", 8, "ep1")
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(ep1.toSet != out.toSet)
    // the order WITHIN a shard differs too (not just shard assignment)
    val posByIdEp0 = out.map(r => r._1 -> (r._2, r._3)).toMap
    assert(ep1.exists(r => posByIdEp0(r._1) != ((r._2, r._3))))
    Seq(0, -3).foreach { bad =>
      intercept[IllegalArgumentException](Sampling.shuffleShards(docs, "id", bad))
    }
  }

  test("packShards: greedy budget layout — contiguous, full, bounded overrun") {
    val docs = spark.range(0, 500).toDF("id")
      .withColumn("s", concat(lit("g"), pmod(col("id"), lit(2))))
      // token sizes 50..449, deterministic
      .withColumn("toks", (pmod(col("id") * 37, lit(400)) + 50).cast("long"))
    val packed = Sampling.packShards(docs, "s", "id", "toks", budgetTokens = 1000L)
      .select("s", "id", "toks", "shard_id")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)

    packed.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // shard ids nondecreasing in id order
      assert(ordered.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      val totals = ordered.groupBy(_._4).map { case (sh, rs) => sh -> rs.map(_._3).sum }
      val last = totals.keys.max
      val maxDoc = ordered.map(_._3).max
      // a doc overrunning shard k consumes part of shard k+1's offset
      // range, so a non-final shard can be under budget — but only by
      // less than one document; same bound on the overrun side
      totals.foreach { case (sh, tot) =>
        if (sh != last) assert(tot > 1000 - maxDoc, s"non-final shard $sh underfull: $tot")
        assert(tot < 1000 + maxDoc, s"shard $sh overran by more than one doc: $tot")
      }
    }
  }
}
