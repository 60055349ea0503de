package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Environment-drift shim for externally-produced tables (SURVEY §1.4).
  *
  * The test-data generator regenerates `/root/testdata` between rounds and
  * has already produced three different physical shapes for the same
  * logical event-time column:
  *
  *   - `TIMESTAMP(NANOS)` read as `BIGINT` nanos (under
  *     `spark.sql.legacy.parquet.nanosAsLong=true`),
  *   - untagged `timestamp[us]` (`isAdjustedToUTC=false`), which Spark 4
  *     reads as `TIMESTAMP_NTZ`,
  *   - a plain UTC-adjusted `TIMESTAMP`.
  *
  * Round 7 handled only the first; the second silently broke every query
  * calling `unix_micros(ts)`. All external loads now pass through
  * [[normalize]], which folds each drift class back to the canonical
  * schema BEFORE the query layer sees it, so this breakage class cannot
  * reach operators again.
  */
object TableLoader {

  /** Canonicalize one loaded table: `TIMESTAMP_NTZ` → `TIMESTAMP` for every
    * (possibly nested-in-the-future) top-level column. Every engine
    * entrypoint pins `spark.sql.session.timeZone=UTC`, so the cast is an
    * exact relabel of the same microsecond value — never a wall-clock
    * shift. */
  def normalize(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case StructField(name, TimestampNTZType, _, _) => name
    }
    if (ntz.isEmpty) df
    else if (df.sparkSession.conf.get("spark.sql.session.timeZone") != "UTC") {
      // Belt-and-braces: force the invariant rather than silently shifting
      // wall-clock on a misconfigured entrypoint.
      df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
      normalize(df)
    }
    else df.select(df.schema.fieldNames.map { n =>
      if (ntz.contains(n)) col(n).cast(TimestampType).as(n) else col(n)
    }.toIndexedSeq: _*)
  }

  /** Canonicalize an event-time column that may additionally arrive as raw
    * int64 nanoseconds (the legacy `nanosAsLong` read of
    * `TIMESTAMP(NANOS)`). Integer `div`, NOT `/`: long/long promotes to
    * Double whose 52 mantissa bits round epoch-microsecond values by ±1. */
  def normalizeEventTime(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }

  /** Load `dir/name.parquet` with drift normalization applied. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$dir/$name.parquet"))

  /** Load the events table with both normalizations applied to `ts`. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTime(load(spark, dir, "events"))
}
