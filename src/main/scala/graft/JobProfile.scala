package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-Spark-job time breakdown of one SparkEntry query —
  * `runMain graft.JobProfile <name> [sfDir]`. Runs the query once to
  * warm codegen/JIT, then once with a listener that records every
  * job's wall time and call site, and prints the breakdown sorted by
  * cost. This is the guide-§1 empirical view (which stage is slow) for
  * lifecycle queries whose cost lives in construction-time actions
  * (store builds, collects, guards) that never appear in the final
  * DataFrame's plan. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      val starts = scala.collection.concurrent.TrieMap[Int, (Long, String, Int)]()
      val rows = scala.collection.mutable.ArrayBuffer[(Int, Double, String, Int)]()
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          // stage names carry the action's call site (e.g. "parquet at
          // Retrieval.scala:277"); fold every stage's name + task count
          // so a slow multi-stage job names what it materialized
          val site = js.stageInfos
            .map { si =>
              // the async SQL-exec thread's callsite is useless; dig the
              // first graft/SparkEntry frame out of the stage details
              val frame = si.details.linesIterator
                .find(l => l.contains("graft.") && !l.contains("JobProfile"))
                .map(_.trim.stripPrefix("at ")).getOrElse(si.name)
              s"$frame[${si.numTasks}]"
            }.mkString(" | ")
          starts(js.jobId) = (System.nanoTime(), site,
            js.stageInfos.map(_.numTasks).sum)
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, site, tasks) =>
            rows.synchronized {
              rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, site, tasks))
            }
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val timed = once()
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500) // listener bus drain
      println(f"== $name warm=$warm%.3f timed=$timed%.3f (${rows.size} jobs, " +
        f"job-sum=${rows.map(_._2).sum}%.3f; gap=driver-side work) ==")
      rows.sortBy(-_._2).take(12).foreach { case (id, s, site, tasks) =>
        println(f"  job $id%3d  $s%7.3f s  tasks=$tasks%4d  $site")
      }
    }
    spark.stop()
  }
}
