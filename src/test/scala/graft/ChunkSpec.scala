package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ingest

/** Chunker edge cases pinned to the reference's behavior
  * (app/main.py:383-393): consecutive 512-word groups, short final chunk,
  * empty doc → zero chunks. */
class ChunkSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def chunksOf(text: String, size: Int): Seq[(Int, String)] =
    Ingest.chunk(Seq(("d", text)).toDF("doc_id", "text"), "text", size)
      .select("chunk_idx", "chunk_text").as[(Int, String)].collect().toSeq.sortBy(_._1)

  test("empty and whitespace-only docs produce zero chunks") {
    assert(chunksOf("", 4).isEmpty)
    assert(chunksOf("   \n  ", 4).isEmpty)
  }

  test("fewer words than chunk size -> one chunk") {
    assert(chunksOf("a b c", 4) == Seq((0, "a b c")))
  }

  test("exact multiple of chunk size -> no empty trailing chunk") {
    assert(chunksOf("a b c d", 4) == Seq((0, "a b c d")))
    assert(chunksOf("a b c d e f g h", 4) == Seq((0, "a b c d"), (1, "e f g h")))
  }

  test("short final chunk kept") {
    assert(chunksOf("a b c d e", 4) == Seq((0, "a b c d"), (1, "e")))
  }

  test("newlines and repeated whitespace collapse before splitting") {
    assert(chunksOf("a\nb   c\td", 2) == Seq((0, "a b"), (1, "c d")))
  }

  test("property: chunks partition the cleaned token stream (seeded cases)") {
    val rng = new scala.util.Random(42)
    // batch all cases into ONE DataFrame -> one Spark job, not 60
    val cases = (0 until 60).map { i =>
      val n = rng.nextInt(30)
      val words = Seq.fill(n)(('a' + rng.nextInt(26)).toChar.toString * (1 + rng.nextInt(3)))
      val size = 1 + rng.nextInt(7)
      (i, words.mkString(" "), size)
    }
    val dfs = cases.groupBy(_._3).toSeq.map { case (size, cs) =>
      Ingest.chunk(cs.map(c => (c._1, c._2)).toDF("case_id", "text"), "text", size)
        .select(col("case_id"), col("chunk_idx"), col("chunk_text"))
    }
    val all = dfs.reduce(_ unionByName _)
      .as[(Int, Int, String)].collect().groupBy(_._1)
    cases.foreach { case (id, text, size) =>
      val expected = text.split("\\s+").filter(_.nonEmpty).toSeq
      val chunks = all.getOrElse(id, Array.empty).sortBy(_._2).toSeq
      val rejoined = chunks.map(_._3).mkString(" ").split("\\s+").filter(_.nonEmpty).toSeq
      assert(rejoined == expected, s"case $id size $size")
      assert(chunks.map(_._2) == chunks.indices.toSeq, s"case $id chunk_idx gap")
      val expectedN = if (expected.isEmpty) 0 else math.ceil(expected.size.toDouble / size).toInt
      assert(chunks.size == expectedN, s"case $id chunk count")
    }
  }

  test("PMC smoke: chunk counts match the reference formula on real files") {
    val dir = new java.io.File("/root/reference/PMC")
    assume(dir.isDirectory, "reference corpus not present")
    val files = dir.listFiles().filter(_.getName.endsWith(".txt")).sortBy(_.getName).take(5)
    val docs = files.map { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      (f.getName, text)
    }.toSeq.toDF("doc_id", "text")
    val counts = Ingest.chunk(docs, "text", 512)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    docs.as[(String, String)].collect().foreach { case (id, text) =>
      val nWords = text.trim.split("\\s+").count(_.nonEmpty)
      val expected = math.ceil(nWords.toDouble / 512).toLong
      assert(counts.getOrElse(id, 0L) == expected, s"doc $id")
    }
  }
}
