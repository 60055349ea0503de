package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("exact quantiles: linear interpolation on a known sequence") {
    // group g: values 0..100 → p50 = 50, p90 = 90 exactly
    val df = (0 to 100).map(v => ("g", v.toLong)).toDF("src", "len")
    val r = Stats.lengthQuantiles(df, "src", "len", Seq(0.5, 0.9)).collect()(0)
    val idx = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(idx("n")) == 101)
    assert(r.getDouble(idx("p50")) == 50.0)
    assert(r.getDouble(idx("p90")) == 90.0)
    // interpolated case: {0, 10} → p50 = 5
    val r2 = Stats.lengthQuantiles(Seq(("h", 0L), ("h", 10L)).toDF("src", "len"),
      "src", "len", Seq(0.5)).collect()(0)
    assert(r2.getDouble(2) == 5.0)
  }

  test("sketch path tracks exact within rank-error bound") {
    val df = (0 until 20000).map(v => (s"s${v % 4}", (v * 31 % 9973).toLong))
      .toDF("src", "len")
    val exact = Stats.lengthQuantiles(df, "src", "len", Seq(0.5, 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val approx = Stats.approxLengthQuantiles(df, "src", "len", Seq(0.5, 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    for ((src, (e50, e99)) <- exact) {
      val (a50, a99) = approx(src)
      // accuracy 10000 → rank error ≤ n/10000 ≈ 0.5 ranks; values are
      // spread over ~10k distinct longs, allow a generous value margin
      assert(math.abs(a50 - e50) <= 20.0, s"$src p50 $a50 vs $e50")
      assert(math.abs(a99 - e99) <= 60.0, s"$src p99 $a99 vs $e99")
    }
  }
}
