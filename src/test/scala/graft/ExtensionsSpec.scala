package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("graft_dot registers and evaluates from pure SQL") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(out == 11.0)
    // implicit cast path: float arrays work too
    Seq((Seq(1f, 0f), Seq(1f, 1f))).toDF("a", "b").createOrReplaceTempView("v")
    assert(spark.sql("SELECT graft_dot(a, b) FROM v").as[Double].head() == 1.0)
  }

  test("graft_cosine from SQL: value + zero-norm guard") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))")
      .as[Double].head() == 1.0)
    assert(spark.sql("SELECT graft_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D))")
      .as[Double].head() == 0.0)
  }

  test("text expressions register and evaluate from pure SQL") {
    GraftExtensions.register(spark)
    val sh = spark.sql(
      "SELECT graft_shingles(array('a','b','c','d'), 2) AS s").as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c d"))
    val shSet = spark.sql(
      "SELECT graft_shingle_set(array('a','b','a','b'), 2) AS s").as[Seq[String]].head()
    assert(shSet == Seq("a b", "b a"))
    // SQL simhash equals the column-API simhash on the same tokens
    val viaSql = spark.sql(
      "SELECT graft_simhash(array('alpha','beta','gamma'), 16) AS h").as[Long].head()
    val viaCol = Seq("alpha beta gamma").toDF("t")
      .select(graft.operators.Dedup.simhash(col("t"), 16).as("h")).as[Long].head()
    assert(viaSql == viaCol)
    // hashed BoW: dim-8 vector, total mass == token count in abs sum
    val bow = spark.sql(
      "SELECT graft_hashed_bow(array('x','y','z'), 8) AS v").as[Seq[Double]].head()
    assert(bow.length == 8 && bow.map(math.abs).sum == 3.0)
  }

  test("graft_uniform from SQL equals Sampling.uniformByHash") {
    GraftExtensions.register(spark)
    val ids = spark.range(0, 1000).toDF("id")
    ids.createOrReplaceTempView("u_ids")
    val viaSql = spark.sql("SELECT id, graft_uniform(id) AS u FROM u_ids ORDER BY id")
      .as[(Long, Double)].collect()
    val viaDsl = ids
      .select(col("id"), graft.operators.Sampling.uniformByHash(col("id")).as("u"))
      .orderBy("id").as[(Long, Double)].collect()
    assert(viaSql.toSeq == viaDsl.toSeq)
    viaSql.foreach { case (_, u) => assert(u >= 0.0 && u < 1.0) }
  }

  test("withExtensions session exposes graft_dot") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = s2.sql("SELECT graft_dot(array(2.0D), array(5.0D)) AS d").collect()(0).getDouble(0)
      assert(d == 10.0)
    } finally {
      // do not stop: shares the context with the suite session
    }
  }

  test("salted join equals the plain join, spread over buckets") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "row_id")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "v")
    val plain = big.join(small, "key").select("key", "row_id", "v")
      .as[(String, Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(big, small, "key", "row_id", buckets = 8)
      .select("key", "row_id", "v").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 100)
    // the hot key really is spread over multiple salt buckets
    val saltDist = big.filter(col("key") === "hot")
      .select(SkewJoin.salt(col("row_id"), 8)).as[Int].distinct().collect().toSeq
    assert(saltDist.size > 1)
  }
}
