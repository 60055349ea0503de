package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: backward as-of join and
  * point-in-interval range join (north-star §2.F-adjacent breadth; both
  * named in the build brief as custom-operator candidates).
  *
  * Each is expressed as a composition of built-ins whose PLAN has the
  * scale shape a dedicated physical operator would have — no cartesian
  * products, no per-row lookups, bounded row expansion — so Catalyst/AQE
  * still see through them (pushdown, skew handling, codegen).
  */
object TemporalJoins {

  /** Backward (most-recent-at-or-before) as-of join: for each left row,
    * attach `payloadCols` from the latest right row with the same keys
    * and `right.tsCol <= left.tsCol`; left rows with no such right row
    * get nulls (left-outer semantics).
    *
    * NOT implemented as a join: a range-condition join would explode to
    * (left × right-per-key) before picking the max. Instead both sides
    * union-tag into one stream and a single keyed window carries the
    * last non-null payload forward — ONE shuffle on the keys, linear
    * work, no join operator in the plan (TemporalJoinsSpec pins this).
    * This is the classic distributed merge_asof shape and survives
    * 100 TB: shuffle volume = |left| + |right| rows, nothing quadratic.
    *
    * Ties: a right row at exactly left's timestamp IS visible (the
    * window orders right rows before left rows at equal ts — DuckDB
    * `ASOF JOIN ... ON l.ts >= r.ts` semantics). Callers must
    * deduplicate right rows per (keys, ts) first if several payloads can
    * share a timestamp; the operator itself is deterministic given
    * unique (keys, ts) on the right.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val r = right
      .select((keys.map(col) :+ col(tsCol) :+
        struct(payloadCols.map(col): _*).as("_asof_pay")): _*)
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    // left-only columns become null on right rows and vice versa
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_asof_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(c => col(s"_asof.$c").as(c)): _*)
  }

  /** Point-in-interval range join: rows of `points` paired with every
    * `intervals` row sharing `keys` whose [startCol, endCol] contains
    * pointCol (inclusive both ends; all three are comparable numerics,
    * e.g. epoch micros).
    *
    * A raw range-condition join is a per-key cartesian. The scalable
    * form buckets time into `binSize`-wide bins: each interval is
    * exploded to the bins it overlaps (ceil(len/bin)+1 copies — bounded,
    * ~2 when binSize ≈ interval length), each point maps to its single
    * bin, and the join becomes a plain EQUI-join on (keys, bin) with an
    * exact BETWEEN re-check. A (point, interval) pair can only meet in
    * the point's one bin, so no dedup is needed. Equi-join means
    * sort-merge/broadcast + AQE skew splitting all still apply at
    * 100 TB; TemporalJoinsSpec pins the no-nested-loop plan.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    // integer `div`, not `/`: double division rounds epoch micros
    val i = intervals.withColumn("_bin",
      explode(expr(s"sequence($startCol div $binSize, $endCol div $binSize)")))
    val p = points.withColumn("_bin", expr(s"$pointCol div $binSize"))
    p.join(i, keys :+ "_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }
}
