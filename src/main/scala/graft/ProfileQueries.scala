package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool for the optimization rounds: capture, in ONE session (so
  * ~100 queries don't pay ~30 s of JVM+session startup each, the
  * TimeOne cost), each named query's `.explain("formatted")` plan and
  * a warm noop-sink timing.
  *
  * `runMain graft.ProfileQueries <outDir> <suffix> <runs> [names...]`
  * — no names = every SparkEntry query. Writes
  * <outDir>/<name>_<suffix>.txt with the formatted plan followed by
  * the AQE final plan, and prints one `PROFILE <name> warm=X runs=[..]`
  * line per query (warm = first run, includes codegen; runs = the next
  * <runs> timed executions — 0 means plan-only, one execution total).
  * Session config matches Bench's so timings and plan shapes are
  * comparable. */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val runs = args(2).toInt
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup action as Bench so the first query isn't session startup
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        spark.sparkContext.setJobDescription(name)
        val df = fn(spark, sfDir)
        val planned = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // one execution so the AQE-final executed plan is available;
        // doubles as the codegen/JIT warm run for the timed ones below
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val warm = (System.nanoTime() - t0) / 1e9
        val aqe = df.queryExecution.executedPlan.toString
        val timed = (1 to runs).map(_ => once())
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
          s"== $name ($suffix) warm=$warm timed=${timed.mkString(",")} ==\n\n" +
            planned + "\n=== AQE FINAL ===\n" + aqe)
        println(f"PROFILE $name warm=$warm%.3f timed=[${timed.map(t => f"$t%.3f").mkString(",")}]")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"PROFILE $name FAILED: ${e.getMessage}")
      } finally spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
