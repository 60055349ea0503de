package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star surface): image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing here is real — schema, batched partition-wise
  * processing, deterministic outputs; the actual media decode is STUBBED
  * (no image/audio codecs in this environment) behind
  * [[MediaCodecStub]], clearly marked. Swapping in a real decoder keeps
  * every signature unchanged.
  *
  * Scale notes: decode/feature-extract runs per partition via
  * `mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas` batches: amortized setup (a codec context per partition,
  * not per row), no driver round-trips, linear scale-out. Metadata-only
  * ops (length, hash, magic sniff) stay pure column expressions.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, feature: Array[Double])

  /** STUB decoder: deterministic fake "decode" so the pipeline shape is
    * testable without codecs. A real implementation would decode bytes
    * with an image/audio library here. */
  object MediaCodecStub {
    /** Fake dimensions derived from content length (deterministic). */
    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      (64 + (bytes.length % 64), 64 + ((bytes.length / 64) % 64))

    /** Fake feature vector: byte histogram over 16 buckets, L2-normalized
      * — a stand-in with the exact shape of a real embedding extractor. */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Double] = {
      val h = new Array[Double](dim)
      bytes.foreach(b => h((b & 0xff) % dim) += 1.0)
      val norm = math.sqrt(h.map(x => x * x).sum)
      if (norm == 0.0) h else h.map(_ / (norm + 1e-9))
    }
  }

  /** Magic-byte format sniff as a pure column expression (real, not
    * stubbed — works on any binary column). */
  def sniffFormat(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val magic = upper(hex(substring(bytesCol, 1, 4)))
    when(magic.startsWith("FFD8FF"), "jpeg")
      .when(magic.startsWith("89504E47"), "png")
      .when(magic.startsWith("47494638"), "gif")
      .when(magic.startsWith("52494646"), "riff")
      .when(magic.startsWith("25504446"), "pdf")
      .otherwise("unknown")
  }

  /** Partition-batched decode + feature extraction (stubbed decode). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would initialize a codec context here
      rows.map { r =>
        val (w, h) = MediaCodecStub.decodeDims(r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, w, h,
          MediaCodecStub.features(r.bytes))
      }
    }
  }

  /** Resize (stubbed decode): deterministic nearest-neighbor downsample
    * of the fake pixel buffer to `targetW`×`targetH`. The mapPartitions
    * batch shape, output schema and determinism are the real contract a
    * codec-backed implementation drops into. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(targetW > 0 && targetH > 0)
    media.mapPartitions { rows =>
      // per-partition setup would initialize the codec/scaler here
      rows.map { r =>
        val (w, h) = MediaCodecStub.decodeDims(r.bytes)
        // fake "pixels": byte i of the payload stands for pixel (i%w, i/w)
        val out = new Array[Byte](targetW * targetH)
        var y = 0
        while (y < targetH) {
          var x = 0
          while (x < targetW) {
            val sx = x * w / targetW
            val sy = y * h / targetH
            val src = sy * w + sx
            out(y * targetW + x) =
              if (r.bytes.isEmpty) 0 else r.bytes(src % r.bytes.length)
            x += 1
          }
          y += 1
        }
        (r.media_id, r.kind, targetW, targetH, out)
      }
    }.toDF("media_id", "kind", "width", "height", "pixels")
  }

  /** Deterministic frame sampling stub: every `stride`-th fixed-size block
    * of the payload stands in for a decoded video frame. */
  def sampleFrames(media: Dataset[MediaRow], blockSize: Int = 1024,
                   stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nBlocks = (r.bytes.length + blockSize - 1) / blockSize
      (0 until nBlocks by stride).map { i =>
        val from = i * blockSize
        val until = math.min(from + blockSize, r.bytes.length)
        (r.media_id, i, r.bytes.slice(from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Metadata projection over any binary column — pure expressions. */
  def withMetadata(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(bytesCol)).cast("long"))
      .withColumn("sha256", sha2(col(bytesCol), 256))
      .withColumn("format", sniffFormat(col(bytesCol)))
}
