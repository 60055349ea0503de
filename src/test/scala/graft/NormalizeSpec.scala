package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.{normalizeText, stripAccents}

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("strip-accents parity with utf8proc (DuckDB oracle) repertoire") {
    // expected values are DuckDB strip_accents outputs, probed directly:
    // decomposable letters fold; ø/ligatures/full-width pass through
    val cases = Seq(
      "café" -> "cafe", "naïve" -> "naive", "Zürich" -> "Zurich",
      "ñandú" -> "nandu", "øre" -> "øre", "Ångström" -> "Angstrom",
      "ﬁne" -> "ﬁne", "ｆｕｌｌ" -> "ｆｕｌｌ", "François" -> "Francois",
      "mañana" -> "manana", "" -> "", "plain ascii!" -> "plain ascii!")
    val out = cases.map(_._1).toDF("s")
      .select(stripAccents(col("s"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("normalizeText: accent fold + lower + whitespace collapse + trim") {
    val out = Seq("  Café\tNAÏVE  \n Zürich  ").toDF("s")
      .select(normalizeText(col("s"))).as[String].head()
    assert(out == "cafe naive zurich")
  }

  test("null-safe and codegen-compatible over a range-backed plan") {
    val df = spark.range(100)
      .select(when(col("id") % 2 === 0,
        concat(lit("Élan"), col("id"))).as("s"))
      .select(stripAccents(col("s")).as("t"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 50)
    assert(rows.filter(!_.isNullAt(0)).forall(_.getString(0).startsWith("Elan")))
  }
}
