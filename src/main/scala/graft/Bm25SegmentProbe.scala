package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tooling for the segmented BM25 store's one unbounded axis:
  * [[operators.Retrieval.bm25FromSegments]] pays one pruned postings
  * read PER SEGMENT per probe, so probe latency rides the number of
  * appends since the last compaction. This main measures that curve —
  * the SAME corpus (sf0.1 documents) split into 1 / 8 / 32 / 128
  * segments, probe latency min-of-3 after one warmup, plus the
  * compacted (monolithic) probe as the floor — so the compaction
  * cadence and the [[operators.Retrieval.MaxSegmentsBeforeCompaction]]
  * warning threshold are numbers, not guesses.
  *
  * Run: `sbt "runMain graft.Bm25SegmentProbe [sfDir]"`. Prints a
  * markdown table + one JSON line (committed into SCALE.md).
  *
  * `runMain graft.Bm25SegmentProbe bloom` instead measures the
  * append-guard idBloom CROSSOVER the Retrieval scaladoc claims
  * (">~10^6 stored ids"): per stored-id count, the latency of a
  * 1000-row append under the exact-join guard vs under the bloom fast
  * path, on synthetic minimal-text corpora where the guard — not the
  * postings build — dominates.
  */
object Bm25SegmentProbe {
  def main(args: Array[String]): Unit = {
    if (args.contains("bloom")) { bloomCrossover(); return }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = sources.TableLoader.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val query = "distributed query engine shuffle join optimizer"

    def timeProbe(probe: () => org.apache.spark.sql.DataFrame): Double = {
      probe().write.mode("overwrite").format("noop").save() // warmup
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        probe().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val counts = Seq(1, 8, 32, 128)
    val rows = counts.map { k =>
      val dir = java.nio.file.Files.createTempDirectory(s"bm25segprobe_$k").toString
      val tb = System.nanoTime()
      (0 until k).foreach { i =>
        operators.Retrieval.appendBm25Segment(
          docs.filter(pmod(col("doc_id"), lit(k)) === i),
          "doc_id", "text", dir, f"s$i%04d", nBuckets = 32,
          autoCompactAt = 0) // this section measures the RAW curve
      }
      val buildS = (System.nanoTime() - tb) / 1e9
      val probeS = timeProbe(() =>
        operators.Retrieval.bm25FromSegments(spark, dir, "doc_id", query))
      val out = java.nio.file.Files.createTempDirectory(s"bm25segprobe_c$k").toString
      val tc = System.nanoTime()
      operators.Retrieval.compactBm25Segments(spark, dir, out)
      val compactS = (System.nanoTime() - tc) / 1e9
      val monoS = timeProbe(() =>
        operators.Retrieval.bm25FromIndex(spark, out, "doc_id", query))
      println(f"segments=$k%4d probe=$probeS%.3f s (mono floor $monoS%.3f) " +
        f"append-all=$buildS%.1f s compact=$compactS%.1f s")
      (k, probeS, monoS, buildS, compactS)
    }
    println(s"\n| segments | probe s | monolithic floor s | compact s | probe/floor |")
    println("|---|---|---|---|---|")
    rows.foreach { case (k, p, m, _, c) =>
      println(f"| $k | $p%.3f | $m%.3f | $c%.1f | ${p / m}%.1f× |")
    }
    val json = rows.map { case (k, p, m, b, c) =>
      f""""s$k":{"probe":$p%.3f,"mono":$m%.3f,"append_all":$b%.1f,"compact":$c%.1f}"""
    }.mkString(",")
    println(s"""{"bench":"bm25_segment_curve","sf":"$sfDir","n_docs":$nDocs,$json}""")

    // AUTO-COMPACT CADENCE (the default-on posture): a 100-append run
    // at the real cap (MaxSegmentsBeforeCompaction = 32), each append a
    // 1/100 doc slice — the hourly-upload shape. Every compact-on-
    // append fold is timed inside its append; the probe is sampled
    // every 10 appends. The claims this measures: probe latency never
    // leaves the ~cap-segment band (vs the unbounded 0.23 s/segment
    // accretion above), and total compaction time amortizes to a small
    // fraction of total append time.
    locally {
      val nAppends = 100
      val cap = operators.Retrieval.MaxSegmentsBeforeCompaction
      val dir = java.nio.file.Files.createTempDirectory("bm25cadence").toString
      var compactEvents = 0
      var tAppendTotal = 0.0
      var maxProbe = 0.0
      val samples = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
      def segCount(): Int = {
        val segRoot = new java.io.File(s"$dir/segments")
        if (segRoot.exists()) segRoot.listFiles().count(_.isDirectory) else 0
      }
      (0 until nAppends).foreach { i =>
        val before = segCount()
        val t0 = System.nanoTime()
        operators.Retrieval.appendBm25Segment(
          docs.filter(pmod(col("doc_id"), lit(nAppends)) === i),
          "doc_id", "text", dir, f"a$i%04d", nBuckets = 32)
        tAppendTotal += (System.nanoTime() - t0) / 1e9
        val after = segCount()
        if (after <= before) compactEvents += 1 // the append folded the store
        if ((i + 1) % 10 == 0) {
          val p = timeProbe(() =>
            operators.Retrieval.bm25FromSegments(spark, dir, "doc_id", query))
          maxProbe = math.max(maxProbe, p)
          samples += ((i + 1, after, p))
          println(f"cadence append=${i + 1}%3d segments=$after%2d probe=$p%.3f s")
        }
      }
      val monoFloor = rows.find(_._1 == 1).map(_._2).getOrElse(Double.NaN)
      println(f"cadence summary: appends=$nAppends cap=$cap compactions=$compactEvents " +
        f"append-total=$tAppendTotal%.1f s maxProbe=$maxProbe%.3f s " +
        f"(1-segment floor $monoFloor%.3f s)")
      val sJson = samples.map { case (i, segs, p) =>
        f"""{"append":$i,"segments":$segs,"probe":$p%.3f}""" }.mkString(",")
      println(s"""{"bench":"bm25_autocompact_cadence","sf":"$sfDir","cap":$cap,""" +
        f""""appends":$nAppends,"compactions":$compactEvents,""" +
        f""""append_total":$tAppendTotal%.1f,"max_probe":$maxProbe%.3f,""" +
        s""""samples":[$sJson]}""")
    }
    spark.stop()
  }

  /** The idBloom crossover measurement: for each stored-id count, the
    * base store is 8 synthetic segments (tiny text, so the guard term
    * dominates the append), then three 1000-row appends are timed
    * under the EXACT-join guard (no sidecar yet), the bloom bootstrap
    * append is timed once, and three more are timed on the
    * bloom-carrying store (store-level maintenance keeps the fast path
    * live for default-flag appends). The claim under test: the fast
    * path loses while stored ids are few (it pays two sidecar writes
    * per append) and wins once the per-append prior-ids scan
    * dominates — the scaladoc says around 10^6 ids. */
  private def bloomCrossover(): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Seq(10000L, 100000L, 1000000L, 4000000L).map { size =>
      val dir = java.nio.file.Files.createTempDirectory(s"bm25bloomx_$size").toString
      def docsIn(lo: Long, hi: Long) = spark.range(lo, hi)
        .select(col("id").as("doc_id"),
          concat(lit("term"), pmod(col("id"), lit(1000))).as("text"))
      (0 until 8).foreach { i =>
        operators.Retrieval.appendBm25Segment(
          docsIn(0, size).filter(pmod(col("doc_id"), lit(8)) === i),
          "doc_id", "text", dir, f"base$i%02d", nBuckets = 32, autoCompactAt = 0)
      }
      var nextId = size
      def timedAppend(seg: String, bloomFlag: Boolean): Double = {
        val t0 = System.nanoTime()
        operators.Retrieval.appendBm25Segment(
          docsIn(nextId, nextId + 1000), "doc_id", "text", dir, seg,
          nBuckets = 32, autoCompactAt = 0, idBloom = bloomFlag)
        nextId += 1000
        (System.nanoTime() - t0) / 1e9
      }
      val exactS = (1 to 3).map(i => timedAppend(f"ex$i%02d", bloomFlag = false)).min
      val bootS = timedAppend("boot", bloomFlag = true)
      val bloomS = (1 to 3).map(i => timedAppend(f"bl$i%02d", bloomFlag = false)).min
      println(f"stored=$size%8d exact-append=$exactS%.2f s bloom-append=$bloomS%.2f s " +
        f"(bootstrap $bootS%.2f s) bloom/exact=${bloomS / exactS}%.2f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      (size, exactS, bootS, bloomS)
    }
    println("\n| stored ids | exact append s | bloom append s | bootstrap s | bloom/exact |")
    println("|---|---|---|---|---|")
    rows.foreach { case (n, e, bt, b) =>
      println(f"| $n | $e%.2f | $b%.2f | $bt%.2f | ${b / e}%.2f |")
    }
    val json = rows.map { case (n, e, bt, b) =>
      f""""n$n":{"exact":$e%.2f,"bloom":$b%.2f,"bootstrap":$bt%.2f}""" }.mkString(",")
    println(s"""{"bench":"bm25_idbloom_crossover",$json}""")
    spark.stop()
  }
}
