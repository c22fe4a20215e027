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

  /** REAL header decode for the common image container formats — pure
    * JVM byte parsing, no codec dependency:
    *
    *   - PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
    *     width/height are the two big-endian u32s at offsets 16/20.
    *   - JPEG: SOI then a segment walk (`FF mm len payload`) to the first
    *     SOF frame header (C0–CF minus the non-frame C4/C8/CC); its
    *     payload is `precision u8, height u16be, width u16be`.
    *   - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    *     little-endian u16 width/height at offsets 6/8.
    *   - MP4/ISO-BMFF: `ftyp` first box, then a box walk into `moov` for
    *     `mvhd` (movie timescale + duration) and the first track's
    *     `tkhd` (16.16 fixed-point pixel dims); u64 largesize and
    *     version-1 (64-bit time) headers handled.
    *
    * Anything else (or a truncated/malformed header) falls back to
    * [[StubDecoder]] rather than throwing — at corpus scale a bad file is
    * a row-level fact to record, never a task failure. Full pixel decode
    * still belongs to a real codec; headers cover the metadata a curation
    * pipeline filters on (dimensions, format) without one.
    */
  object HeaderDecoder extends MediaDecoder {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

    private val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 24 && b.take(8).sameElements(pngMagic) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

    private def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

    private def isGif(b: Array[Byte]): Boolean =
      b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a'

    /** Walk JPEG segments to the first frame header; None if the stream
      * ends (or hits entropy-coded data) before one appears.
      */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xff) {
        var j = i
        while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes are legal
        if (j >= b.length) return None
        val marker = u8(b, j)
        marker match {
          case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
            // SOF payload: len(2) precision(1) height(2) width(2)
            // width occupies bytes j+6..j+7, so payload-ends-at-EOF parses
            return if (j + 8 <= b.length) Some((be16(b, j + 6), be16(b, j + 4))) else None
          case 0xd9 | 0xda => return None // EOI / start-of-scan: no frame header seen
          case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
            i = j + 1 // standalone markers carry no length
          case _ =>
            if (j + 2 >= b.length) return None
            i = j + 1 + be16(b, j + 1)
        }
      }
      None
    }

    private def le32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
        (u8(b, i + 3).toLong << 24)

    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** Walk RIFF chunks to `fmt `; audio features map onto the generic
      * record as width=sample rate, height=channel count.
      */
    private def wavFeatures(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 12L
      while (i + 8 <= b.length) {
        val at = i.toInt
        val isFmt = b(at) == 'f' && b(at + 1) == 'm' && b(at + 2) == 't' && b(at + 3) == ' '
        val size = le32(b, at + 4) // unsigned 32-bit — keep as Long
        if (isFmt)
          return if (i + 16 <= b.length) Some((le32(b, at + 12).toInt, le16(b, at + 10)))
          else None
        // advance with Long arithmetic; a hostile size (e.g. 0xFFFFFFF8,
        // which as Int is -8) must never yield a zero/negative step — the
        // malformed-media contract is a row-level stub fallback, never a
        // hung executor task
        val next = i + 8 + size + (size & 1L) // chunks are word-aligned
        if (next <= i || next > b.length) return None
        i = next
      }
      None
    }

    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)

    /** ISO-BMFF (MP4/MOV/M4A): any file whose first box is `ftyp`. */
    private def isMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    /** First box of `typ` in [from, to): (payloadStart, boxEnd). Box =
      * u32be size + 4cc type; size 1 → u64 largesize follows; size 0 →
      * box runs to `to`. A hostile/truncated size that fails to advance
      * or overruns ends the walk (None) — the malformed-media contract
      * is a row-level fallback, never a hung task.
      */
    private def findBox(
        b: Array[Byte], from: Long, to: Long, typ: String): Option[(Long, Long)] = {
      var i = from
      while (i + 8 <= to) {
        val at = i.toInt
        val size32 = be32(b, at)
        val t = new String(b, at + 4, 4, "US-ASCII")
        val (payload, end) =
          if (size32 == 1L) {
            if (i + 16 > to) return None
            (i + 16, i + be64(b, at + 8))
          } else if (size32 == 0L) (i + 8, to)
          else (i + 8, i + size32)
        if (end <= i || end > to) return None
        if (t == typ) return Some((payload, end))
        i = end
      }
      None
    }

    /** mvhd → (timescale, duration ticks); version 1 uses 64-bit times.
      * Bounds are checked against the BOX's own end, not the buffer: an
      * undersized box must yield None, never fields read from sibling
      * boxes' bytes.
      */
    private def mvhdMeta(b: Array[Byte], p0: Long, boxEnd: Long): Option[(Long, Long)] = {
      val p = p0.toInt
      val end = math.min(boxEnd, b.length.toLong)
      if (p + 4 > end) None
      else if (u8(b, p) == 0) {
        if (p + 20 > end) None else Some((be32(b, p + 12), be32(b, p + 16)))
      } else {
        if (p + 32 > end) None else Some((be32(b, p + 20), be64(b, p + 24)))
      }
    }

    /** tkhd → (width, height): 16.16 fixed point after the transform
      * matrix; offsets differ between version 0 and 1 (64-bit times).
      * Bounds against the box end — see [[mvhdMeta]].
      */
    private def tkhdDims(b: Array[Byte], p0: Long, boxEnd: Long): Option[(Int, Int)] = {
      val p = p0.toInt
      val end = math.min(boxEnd, b.length.toLong)
      if (p + 4 > end) None
      else {
        val (wOff, need) = if (u8(b, p) == 0) (p + 76, p + 84) else (p + 88, p + 96)
        if (need > end) None
        else Some(((be32(b, wOff) >> 16).toInt, (be32(b, wOff + 4) >> 16).toInt))
      }
    }

    /** Parsed MP4 header metadata (what a curation pipeline filters
      * videos on without a codec): movie duration/timescale from `mvhd`,
      * first video track's pixel dims from `tkhd`.
      */
    final case class Mp4Meta(
        byte_len: Long, timescale: Long, duration_ticks: Long, width: Int, height: Int)

    /** Box walk ftyp → moov → (mvhd, trak/tkhd). None for non-MP4 bytes
      * or any truncated/hostile structure.
      */
    def decodeMp4(b: Array[Byte]): Option[Mp4Meta] =
      if (!isMp4(b)) None
      else
        for {
          (moovP, moovEnd) <- findBox(b, 0L, b.length.toLong, "moov")
          (mvhdP, mvhdEnd) <- findBox(b, moovP, moovEnd, "mvhd")
          (ts, dur) <- mvhdMeta(b, mvhdP, mvhdEnd)
          (trakP, trakEnd) <- findBox(b, moovP, moovEnd, "trak")
          (tkhdP, tkhdEnd) <- findBox(b, trakP, trakEnd, "tkhd")
          (w, h) <- tkhdDims(b, tkhdP, tkhdEnd)
        } yield Mp4Meta(b.length.toLong, ts, dur, w, h)

    def decode(bytes: Array[Byte]): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      if (isPng(bytes))
        MediaFeatures(bytes.length.toLong, "png",
          be32(bytes, 16).toInt, be32(bytes, 20).toInt, hex)
      else if (isGif(bytes))
        MediaFeatures(bytes.length.toLong, "gif", le16(bytes, 6), le16(bytes, 8), hex)
      else if (isJpeg(bytes))
        jpegDims(bytes) match {
          case Some((w, h)) => MediaFeatures(bytes.length.toLong, "jpeg", w, h, hex)
          case None => StubDecoder.decode(bytes)
        }
      else if (isWav(bytes))
        wavFeatures(bytes) match {
          case Some((rate, ch)) => MediaFeatures(bytes.length.toLong, "wav", rate, ch, hex)
          case None => StubDecoder.decode(bytes)
        }
      else if (isMp4(bytes))
        decodeMp4(bytes) match {
          case Some(m) => MediaFeatures(bytes.length.toLong, "mp4", m.width, m.height, hex)
          case None => StubDecoder.decode(bytes)
        }
      else StubDecoder.decode(bytes)
    }
  }

  /** Minimal-but-valid synthetic image fixtures: enough structure for any
    * header parser (this one, PIL, file(1)) to read real dimensions out.
    * Used by the mm3 gate and MultimodalSpec; also the golden path for
    * validating a future real-codec decoder.
    */
  object Fixtures {
    private def be32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)

    /** PNG signature + IHDR (8-bit RGB, zero CRC): 33 bytes. */
    def pngBytes(width: Int, height: Int): Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes("US-ASCII") ++
        be32(width.toLong) ++ be32(height.toLong) ++
        Array[Byte](8, 2, 0, 0, 0) ++ be32(0)

    /** SOI + JFIF APP0 + SOF0 (8-bit, 3 components) + EOI: 41 bytes. */
    def jpegBytes(width: Int, height: Int): Array[Byte] =
      Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
        Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(height) ++ be16(width) ++
        Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) ++
        Array(0xff, 0xd9).map(_.toByte)

    /** GIF89a header + logical screen descriptor + trailer: 14 bytes. */
    def gifBytes(width: Int, height: Int): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte]((width & 0xff).toByte, ((width >> 8) & 0xff).toByte,
          (height & 0xff).toByte, ((height >> 8) & 0xff).toByte, 0, 0, 0) ++
        Array(0x3b.toByte)

    private def le32(v: Long): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    private def le16v(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)

    /** Canonical 44-byte PCM WAV header (empty data chunk). */
    def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int = 16): Array[Byte] = {
      val blockAlign = channels * bitsPerSample / 8
      "RIFF".getBytes("US-ASCII") ++ le32(36L) ++ "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16L) ++ le16v(1) ++ le16v(channels) ++
        le32(sampleRate.toLong) ++ le32(sampleRate.toLong * blockAlign) ++
        le16v(blockAlign) ++ le16v(bitsPerSample) ++
        "data".getBytes("US-ASCII") ++ le32(0L)
    }

    private def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

    private val unityMatrix: Array[Byte] =
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000L) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)

    /** Minimal-but-valid ISO-BMFF header: `ftyp(isom)` +
      * `moov{mvhd(v0) + trak{tkhd(v0)}}` — 236 bytes, parseable by any
      * box walker (this one, ffprobe, mp4dump). No media data: headers
      * are what a curation pipeline filters on.
      */
    def mp4Bytes(width: Int, height: Int, timescale: Long, duration: Long): Array[Byte] = {
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
      val mvhd = box("mvhd",
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ // v0, ctime, mtime
          be32(timescale) ++ be32(duration) ++
          be32(0x00010000L) ++ Array[Byte](1, 0) ++ // rate 1.0, volume 1.0
          Array.fill[Byte](10)(0) ++ unityMatrix ++
          Array.fill[Byte](24)(0) ++ be32(2)) // predefined, next track id
      val tkhd = box("tkhd",
        Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++ // v0 + enabled flags
          be32(1) ++ be32(0) ++ be32(duration) ++ // track id, reserved, duration
          Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(0) ++ // reserved, layer..volume
          unityMatrix ++
          be32(width.toLong << 16) ++ be32(height.toLong << 16)) // 16.16 fixed
      ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
    }
  }

  /** Video-header schema produced by [[decodeVideoMeta]]. */
  val videoMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_ticks", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Decode MP4/ISO-BMFF headers partition-at-a-time, appending a video
    * metadata struct; null/empty/non-MP4/truncated payloads yield a null
    * struct (row-level fact, never a task failure) — same contract as
    * [[decodeFeatures]].
    */
  def decodeVideoMeta(
      df: DataFrame,
      binaryCol: String,
      outCol: String = "video"): DataFrame = {
    val schema = df.schema.add(outCol, videoMetaSchema, nullable = true)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(binIdx) match {
          case b: Array[Byte] if b.nonEmpty => b
          case _ => null
        }
        val meta =
          if (bytes == null) null
          else HeaderDecoder.decodeMp4(bytes)
            .map(m => Row(m.byte_len, m.timescale, m.duration_ticks, m.width, m.height))
            .orNull
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(encoder)
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
