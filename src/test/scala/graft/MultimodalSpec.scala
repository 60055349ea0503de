package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9)

  test("sniffFormat recognizes magic bytes on binary columns") {
    val df = Seq(("png", png), ("jpeg", jpeg), ("txt", "hello".getBytes))
      .toDF("name", "bytes")
      .select(col("name"), Multimodal.sniffFormat(col("bytes")).as("fmt"))
    val out = df.as[(String, String)].collect().toMap
    assert(out("png") == "png" && out("jpeg") == "jpeg" && out("txt") == "unknown")
  }

  test("withMetadata adds byte length, sha256, format") {
    val df = Multimodal.withMetadata(Seq(("a", "hello".getBytes)).toDF("id", "bytes"), "bytes")
    val row = df.head()
    assert(row.getAs[Long]("n_bytes") == 5L)
    assert(row.getAs[String]("sha256") ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(row.getAs[String]("format") == "unknown")
  }

  test("extractFeatures: deterministic stub features, unit norm, batched per partition") {
    val media = Seq(
      MediaRow(1L, "image", png),
      MediaRow(2L, "image", jpeg),
      MediaRow(3L, "audio", Array.empty[Byte])).toDS().repartition(2)
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == png.length.toLong)
    assert(out(1L).feature.length == 16)
    val norm = math.sqrt(out(1L).feature.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(out(3L).feature.forall(_ == 0.0)) // empty payload stays zero
    // determinism across runs
    val again = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).feature.toSeq == again(1L).feature.toSeq)
  }

  test("sampleFrames strides fixed-size blocks deterministically") {
    val bytes = Array.tabulate(5000)(_.toByte)
    val frames = Multimodal.sampleFrames(Seq(MediaRow(7L, "video", bytes)).toDS(),
        blockSize = 1024, stride = 2)
      .select("media_id", "frame_idx").as[(Long, Int)].collect().toSeq.sorted
    // 5 blocks (0..4), stride 2 -> frames 0, 2, 4
    assert(frames == Seq((7L, 0), (7L, 2), (7L, 4)))
  }

  test("resize: exact target shape, deterministic, empty payload safe") {
    val media = Seq(
      MediaRow(1L, "image", Array.tabulate(3000)(_.toByte)),
      MediaRow(2L, "image", Array.emptyByteArray)).toDS()
    val out = Multimodal.resize(media, 8, 6)
      .select("media_id", "width", "height", "pixels")
      .as[(Long, Int, Int, Array[Byte])].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 8 && out(1L)._3 == 6 && out(1L)._4.length == 48)
    assert(out(2L)._4.length == 48 && out(2L)._4.forall(_ == 0))
    val again = Multimodal.resize(media, 8, 6)
      .select("media_id", "pixels").as[(Long, Array[Byte])].collect().toMap
    assert(again(1L).toSeq == out(1L)._4.toSeq)
  }
}
