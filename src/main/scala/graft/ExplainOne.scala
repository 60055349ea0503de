package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one SparkEntry query:
  * `runMain graft.ExplainOne <name> [sfDir]`. Dev tool — the
  * `.explain("formatted")` of the contract surface, for plan-shape
  * iteration (ReusedExchange, PushedFilters, WholeStageCodegen spans)
  * without writing a scratch main each time. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // run it once so AQE's final plan (with ReusedExchange decisions)
    // is also visible
    df.write.mode("overwrite").format("noop").save()
    println("=== AFTER AQE ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
