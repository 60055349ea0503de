package graft

import org.apache.spark.sql.SparkSession

/** Dev tooling: time a list of SparkEntry queries across several SF
  * dirs in ONE JVM (consistent codegen/JIT state — TimeOne per point
  * would pay a fresh warmup per measurement) and print the scaling
  * curve as a markdown table. One warmup + 2 timed passes per point,
  * min reported; noop sink like Bench.
  *
  * Usage: `runMain graft.ScaleCurve <q1,q2,...> <dir1,dir2,...> [outJson]`
  * With `outJson` given, the full record (per-query seconds per dir,
  * min-of-2-after-warmup policy) is also written as one JSON file —
  * the committed SCALECURVE.json artifact, so later rounds diff sf1
  * timings instead of re-deriving them from prose. A query that OOMs
  * or throws records -1 for that point instead of killing the run
  * (the pinned-codebook families DO die at sf1 — that's the finding).
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dirs = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outJson = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      val t = try {
        fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }.min
      } catch { case e: Throwable =>
        System.err.println(s"[scalecurve] $name @ $dir FAILED: ${e.getMessage}")
        -1.0
      }
      // queries persist/localCheckpoint internally and nothing frees
      // those blocks between measurements — 40+ accumulated runs at sf1
      // contaminated late timings with memory pressure in the first
      // version of this tool; drop ALL cached state between points
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      t
    }
    def fmt(t: Double) = if (t < 0) "FAIL" else f"$t%.2f s"
    def r3(v: Double) = math.round(v * 1000).toDouble / 1000
    // rewrite the artifact after EVERY query: a genuinely fatal point
    // (an sf1 OOM can kill the JVM faster than a catch) then costs only
    // its own row, not the whole run's record
    def writeJson(done: Seq[(String, Seq[Double])]): Unit = outJson.foreach { path =>
      val qs = done.map { case (n, ts) =>
        s""""$n":[${ts.map(r3).mkString(",")}]"""
      }.mkString(",")
      val json = s"""{"bench":"scale_curve","policy":"warmup+min-of-2, cache-cleared between points, FAIL=-1",
        |"dirs":[${dirs.map("\"" + _ + "\"").mkString(",")}],
        |"queries":{$qs}}""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    }
    println("| query | " + dirs.mkString(" | ") + " | ratio last/first |")
    println("|---|" + dirs.map(_ => "---|").mkString + "---|")
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Double])]
    names.foreach { n =>
      val ts = dirs.map(d => run(n, d))
      val ratio = if (ts.exists(_ < 0)) "FAIL" else f"${ts.last / ts.head}%.1f×"
      println(f"| $n | " + ts.map(fmt).mkString(" | ") + s" | $ratio |")
      all += (n -> ts)
      writeJson(all.toSeq)
    }
    outJson.foreach(p => println(s"wrote $p"))
    spark.stop()
  }
}
