package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata;
  * decode / feature-extraction runs partition-at-a-time so per-batch
  * setup (codec init, model load) amortizes across rows — the Scala
  * analog of a Pandas-UDF-over-mapInPandas stage.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): [[StubDecoder]] derives deterministic fake features from the
  * bytes. The Spark-side contract — schema, encoder round-trip, partition
  * batching, null/malformed handling — is real and tested; swapping in a
  * real codec only replaces the [[MediaDecoder]] implementation.
  */
object Multimodal {

  /** Decoded-media feature record (what a real image decode would yield). */
  case class MediaFeatures(
      byte_len: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: String)

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", StringType, nullable = true)))

  /** Batch decoder contract: one instance per partition (amortized init). */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decode: "dimensions" from the first two bytes,
    * format from a magic-byte sniff, md5 checksum. Replace with a real
    * codec (JavaCV / TwelveMonkeys / ffmpeg pipe) in production.
    */
  object StubDecoder extends MediaDecoder {
    private def sniff(bytes: Array[Byte]): String =
      if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "wav"
      else "unknown"

    def decode(bytes: Array[Byte]): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      MediaFeatures(
        byte_len = bytes.length.toLong,
        format = sniff(bytes),
        width = if (bytes.length > 0) (bytes(0) & 0xff) else 0,
        height = if (bytes.length > 1) (bytes(1) & 0xff) else 0,
        checksum = hex)
    }
  }

  /** Decode a binary column partition-at-a-time, appending the feature
    * struct. Null/empty payloads yield a null feature struct rather than
    * failing the task (malformed media is routine at 100 TB — dropping a
    * whole partition for one bad file is not acceptable).
    */
  def decodeFeatures(
      df: DataFrame,
      binaryCol: String,
      outCol: String = "media",
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val schema = df.schema.add(outCol, featureSchema, nullable = true)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition decoder init happens HERE in a real implementation
      val d = decoder
      rows.map { r =>
        val bytes = r.get(binIdx) match {
          case b: Array[Byte] if b.nonEmpty => b
          case _ => null
        }
        val feat =
          if (bytes == null) null
          else {
            val f = d.decode(bytes)
            Row(f.byte_len, f.format, f.width, f.height, f.checksum)
          }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(encoder)
  }

  /** Deterministic frame sampling plan for a video-like payload: every
    * `stride`-th frame index up to `frameCount` — the shuffle-free
    * explode that precedes per-frame decode at scale.
    */
  def sampleFrames(df: DataFrame, frameCountCol: String, stride: Int): DataFrame =
    df.withColumn(
      "frame_idx",
      explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)), lit(stride))))
}
