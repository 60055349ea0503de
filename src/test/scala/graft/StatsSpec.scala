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

  test("quantile column names: full-decimal derivation, no collisions") {
    // the old round(q*100) scheme made 0.005 and 0.01 both `p1`
    assert(Stats.qName(0.5) == "p50" && Stats.qName(0.9) == "p90" &&
      Stats.qName(0.99) == "p99")
    assert(Stats.qName(0.995) == "p995")
    assert(Stats.qName(0.005) == "p005" && Stats.qName(0.01) == "p01")
    assert(Stats.qName(0.0) == "p0" && Stats.qName(1.0) == "p100")

    val df = (0 to 1000).map(v => ("g", v.toLong)).toDF("src", "len")
    val out = Stats.lengthQuantiles(df, "src", "len", Seq(0.005, 0.01))
    assert(out.columns.toSeq == Seq("src", "n", "mean", "p005", "p01"))
    val r = out.collect()(0)
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 10.0)
    // a literally-duplicated quantile is rejected, not silently doubled
    intercept[IllegalArgumentException] {
      Stats.lengthQuantiles(df, "src", "len", Seq(0.5, 0.5))
    }
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
