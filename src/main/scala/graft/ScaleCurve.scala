package graft

import org.apache.spark.sql.SparkSession

/** Dev tooling: time a list of SparkEntry queries across several SF
  * dirs in ONE JVM (consistent codegen/JIT state — TimeOne per point
  * would pay a fresh warmup per measurement) and print the scaling
  * curve as a markdown table. One warmup + 2 timed passes per point,
  * min reported; noop sink like Bench.
  *
  * Usage: `runMain graft.ScaleCurve <q1,q2,...> <dir1,dir2,...>`
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dirs = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
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
      fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      // queries persist/localCheckpoint internally and nothing frees
      // those blocks between measurements — 40+ accumulated runs at sf1
      // contaminated late timings with memory pressure in the first
      // version of this tool; drop ALL cached state between points
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      t
    }
    println("| query | " + dirs.mkString(" | ") + " | ratio last/first |")
    println("|---|" + dirs.map(_ => "---|").mkString + "---|")
    names.foreach { n =>
      val ts = dirs.map(d => run(n, d))
      println(f"| $n | " + ts.map(t => f"$t%.2f s").mkString(" | ") +
        f" | ${ts.last / ts.head}%.1f× |")
    }
    spark.stop()
  }
}
