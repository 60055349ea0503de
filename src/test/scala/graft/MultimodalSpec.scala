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

  test("PnmCodec: P5 encode → decode round-trip, header parsed not assumed") {
    val px = Array.tabulate(12)(i => (i * 20) % 256)
    val bytes = Multimodal.PnmCodec.encodeP5(4, 3, px)
    val img = Multimodal.PnmCodec.decode(bytes).get
    assert(img.format == "pgm" && img.width == 4 && img.height == 3 && img.maxVal == 255)
    assert(img.channels == 1 && img.pixels.toSeq == px.toSeq)
    assert(Multimodal.PnmCodec.sniff(bytes) == Some("pgm"))
  }

  test("PnmCodec: ascii P2 with comments; 16-bit P5 reads big-endian pairs") {
    val p2 = "P2\n# a comment\n3 2\n# another\n15\n0 1 2\n13 14 15\n".getBytes("US-ASCII")
    val img = Multimodal.PnmCodec.decode(p2).get
    assert(img.width == 3 && img.height == 2 && img.maxVal == 15)
    assert(img.pixels.toSeq == Seq(0, 1, 2, 13, 14, 15))
    val wide = "P5\n2 1\n65535\n".getBytes("US-ASCII") ++
      Array[Byte](0x01, 0x00, 0xFF.toByte, 0xFE.toByte)
    val w = Multimodal.PnmCodec.decode(wide).get
    assert(w.maxVal == 65535 && w.pixels.toSeq == Seq(256, 65534))
  }

  test("PnmCodec: P6 RGB decodes; gray is the integer channel mean") {
    val p6 = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 100, 110, 126)
    val img = Multimodal.PnmCodec.decode(p6).get
    assert(img.format == "ppm" && img.channels == 3)
    assert(img.pixels.toSeq == Seq(10, 20, 30, 100, 110, 126))
    assert(img.gray.toSeq == Seq(20, 112))
  }

  test("PnmCodec: truncated, out-of-range, and non-PNM payloads decode to None") {
    assert(Multimodal.PnmCodec.decode(null).isEmpty)
    assert(Multimodal.PnmCodec.decode("P5\n4 4\n255\nxx".getBytes).isEmpty) // truncated raster
    assert(Multimodal.PnmCodec.decode("P2\n1 1\n255\n999\n".getBytes).isEmpty) // sample > maxVal
    assert(Multimodal.PnmCodec.decode("P7\n1 1\n255\n0".getBytes).isEmpty) // unknown kind
    assert(Multimodal.PnmCodec.decode("Plain text, not an image".getBytes).isEmpty)
    assert(Multimodal.PnmCodec.decode("P2\nnot numbers here\n".getBytes).isEmpty)
  }

  test("sniffFormat: PNM magic requires whitespace after the digit") {
    val df = Seq(
      ("pgm", "P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0)),
      ("ppm", "P6 1 1 255 x".getBytes("US-ASCII")),
      ("text", "P5x is prose, not an image".getBytes("US-ASCII")))
      .toDF("name", "bytes")
      .select(col("name"), Multimodal.sniffFormat(col("bytes")).as("fmt"))
    val out = df.as[(String, String)].collect().toMap
    assert(out("pgm") == "pgm" && out("ppm") == "ppm" && out("text") == "unknown")
  }

  test("extractFeatures REAL path: dims from the PGM header, gray-pixel histogram") {
    val px = Array.fill(6)(0) ++ Array.fill(2)(255) // 6 in bin 0, 2 in bin 15
    val media = Seq(MediaRow(9L, "image", Multimodal.PnmCodec.encodeP5(4, 2, px))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.width == 4 && f.height == 2) // parsed, not the stub's fake dims
    val norm = math.sqrt(6.0 * 6 + 2.0 * 2)
    assert(math.abs(f.feature(0) - 6.0 / (norm + 1e-9)) < 1e-12)
    assert(math.abs(f.feature(15) - 2.0 / (norm + 1e-9)) < 1e-12)
    assert(f.feature.slice(1, 15).forall(_ == 0.0))
  }

  test("resize REAL path: output is a decodable P5 with nearest-neighbor samples") {
    // 4×4 gradient → 2×2 picks source pixels (0,0) (2,0) (0,2) (2,2)
    val px = Array.tabulate(16)(i => i * 10)
    val media = Seq(MediaRow(5L, "image", Multimodal.PnmCodec.encodeP5(4, 4, px))).toDS()
    val out = Multimodal.resize(media, 2, 2).select("pixels").as[Array[Byte]].head()
    val img = Multimodal.PnmCodec.decode(out).get
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == Seq(0, 20, 80, 100))
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
