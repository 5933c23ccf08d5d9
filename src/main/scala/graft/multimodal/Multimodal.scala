package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as partition-batched transforms so a real codec
  * (JNI/native or Arrow-batched) drops in without changing the plan
  * shape.
  *
  * Decode is REAL where the JDK has codecs and stubbed only beyond
  * them: images decode via `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP),
  * video via the ISO-BMFF sample-table walk + MJPEG frame decode below;
  * the `stubDecode*` variants remain as the deterministic fallback for
  * formats with no in-container codec (and as the drop-in seam for a
  * heavier JNI/Arrow codec). Every Spark-side concern — schema,
  * nullability, partition batching, column pruning — is real and tested
  * on both paths.
  */
object Multimodal {
  /** media metadata: (kind, byte length, sha-ish content id) */
  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("content_id", LongType, nullable = false)))

  /** Attach the metadata struct for a binary column — pure expressions. */
  def withMeta(df: DataFrame, binCol: String, kind: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(kind).as("kind"),
      length(col(binCol)).cast(LongType).as("n_bytes"),
      xxhash64(col(binCol)).as("content_id")))

  /** REAL image decode via `javax.imageio` — the JDK's built-in codecs
    * (PNG/JPEG/BMP/GIF/WBMP), no external libraries. Emits true
    * (width, height, channels) plus a `dim`-float feature vector:
    * mean-pooled luminance over a √dim×√dim grid, normalized to [0,1].
    * Bytes no installed codec accepts yield NULLs (the honest signal;
    * filter or route them to [[stubDecodeImage]]). Same partition-
    * batched `mapPartitions` contract as the stub path, so swapping in
    * a heavier codec changes no plan shape.
    */
  def decodeImage(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"dim must be a square, got $dim")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      // codec lookup state is JVM-wide; per-partition batching keeps any
      // per-task reader caches warm
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        imageStats(bytes, 0, bytes.length, grid, dim) match {
          case Some((w, h, channels, feats)) =>
            Row.fromSeq(row.toSeq ++ Seq(w, h, channels, feats))
          case None =>
            Row.fromSeq(row.toSeq ++ Seq(null, null, null, null))
        }
      }
    }
  }

  /** Decode `bytes[off, off+len)` with javax.imageio and mean-pool
    * luminance over a grid×grid cell layout — the shared feature
    * extractor behind [[decodeImage]] and [[decodeVideoFrames]].
    */
  private def imageStats(bytes: Array[Byte], off: Int, len: Int, grid: Int,
      dim: Int): Option[(Int, Int, Int, Array[Float])] = {
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes, off, len))
      catch { case _: Exception => null }
    if (img == null) None else Some(bufferedStats(img, grid, dim))
  }

  /** Grid-luminance pooling of an already-decoded BufferedImage — the
    * pixel core shared by [[imageStats]] and [[decodeGifFrames]].
    */
  private def bufferedStats(img: java.awt.image.BufferedImage, grid: Int,
      dim: Int): (Int, Int, Int, Array[Float]) = {
    val w = img.getWidth
    val h = img.getHeight
    val channels = img.getRaster.getNumBands
    val feats = new Array[Float](dim)
    val counts = new Array[Int](dim)
    var y = 0
    while (y < h) {
      val gy = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val gx = math.min(x * grid / w, grid - 1)
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 +
          ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000.0
        val cell = gy * grid + gx
        feats(cell) += (lum / 255.0).toFloat
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) {
      if (counts(i) > 0) feats(i) /= counts(i)
      i += 1
    }
    (w, h, channels, feats)
  }

  /** REAL audio decode via `javax.sound.sampled` — the JDK's built-in
    * codecs (WAV/AIFF/AU, any PCM width; the converter normalizes to
    * 16-bit signed). Emits true (sample_rate, n_channels, n_frames,
    * duration_sec) plus a `nWindows`-float feature vector: RMS energy of
    * the mono mix over equal time slices — the windowed-energy shape
    * audio dedup/quality filters key on. Bytes no installed codec
    * accepts yield NULLs (the honest signal; compressed formats like
    * MP3/OGG have no JDK codec and land there). Same partition-batched
    * `mapPartitions` contract as [[decodeImage]].
    */
  def decodeAudio(df: DataFrame, binCol: String,
      nWindows: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", FloatType, nullable = true),
      StructField("n_channels", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_sec", DoubleType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val decoded =
          try {
            val in = AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = in.getFormat
              val ch = fmt.getChannels
              // normalize to 16-bit signed little-endian PCM for the walk
              val target = new AudioFormat(
                AudioFormat.Encoding.PCM_SIGNED, fmt.getSampleRate, 16, ch,
                ch * 2, fmt.getSampleRate, false)
              val pcm = AudioSystem.getAudioInputStream(target, in)
              val data = pcm.readAllBytes() // bounded by the payload size
              val nFrames = data.length / (2 * ch)
              val sums = new Array[Double](nWindows)
              val counts = new Array[Int](nWindows)
              var f = 0
              while (f < nFrames) {
                // long math: f * nWindows overflows Int past ~134M
                // frames (a ~50 min mono 44.1 kHz payload)
                val w = math.min((f.toLong * nWindows / nFrames).toInt,
                  nWindows - 1)
                var mix = 0.0
                var c = 0
                while (c < ch) {
                  val i = (f * ch + c) * 2
                  val s = ((data(i) & 0xFF) | (data(i + 1) << 8)).toShort
                  mix += s / 32768.0
                  c += 1
                }
                mix /= ch
                sums(w) += mix * mix
                counts(w) += 1
                f += 1
              }
              val feats = Array.tabulate(nWindows)(i =>
                if (counts(i) > 0) math.sqrt(sums(i) / counts(i)).toFloat
                else 0f)
              Some((fmt.getSampleRate, ch, nFrames.toLong,
                nFrames.toDouble / fmt.getSampleRate, feats))
            } finally in.close()
          } catch { case _: Exception => None }
        decoded match {
          case Some((sr, ch, nf, dur, feats)) =>
            Row.fromSeq(row.toSeq ++ Seq(sr, ch, nf, dur, feats))
          case None =>
            Row.fromSeq(row.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }
  }

  private case class VideoMeta(container: String, durationSec: java.lang.Double,
      nTracks: Int, hasVideo: Boolean, hasAudio: Boolean,
      width: java.lang.Integer, height: java.lang.Integer, codec: String)

  /** Walk ISO-BMFF boxes in `bytes[from, to)`; calls `f(type, payloadFrom,
    * payloadTo)` per box, recursing into the standard pure-container
    * boxes. Defensive: any malformed size stops the walk of that level.
    */
  private val bmffContainers = Set("moov", "trak", "mdia", "minf", "stbl")

  private def walkBoxes(bytes: Array[Byte], from: Long, to: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    val containers = bmffContainers
    var p = from
    while (p + 8 <= to) {
      val size0 = ((bytes(p.toInt) & 0xFFL) << 24) |
        ((bytes(p.toInt + 1) & 0xFFL) << 16) |
        ((bytes(p.toInt + 2) & 0xFFL) << 8) | (bytes(p.toInt + 3) & 0xFFL)
      val typ = new String(bytes, p.toInt + 4, 4, "ISO-8859-1")
      var hdr = 8L
      var size = size0
      if (size0 == 1L && p + 16 <= to) {
        // 64-bit largesize follows the type
        size = (8 to 15).foldLeft(0L)((a, i) =>
          (a << 8) | (bytes((p + i).toInt) & 0xFFL))
        hdr = 16L
      } else if (size0 == 0L) size = to - p // box extends to end
      if (size < hdr || p + size > to) return
      f(typ, p + hdr, p + size)
      if (containers(typ)) walkBoxes(bytes, p + hdr, p + size)(f)
      p += size
    }
  }

  private def be32(b: Array[Byte], p: Long): Long =
    ((b(p.toInt) & 0xFFL) << 24) | ((b(p.toInt + 1) & 0xFFL) << 16) |
      ((b(p.toInt + 2) & 0xFFL) << 8) | (b(p.toInt + 3) & 0xFFL)
  private def be64(b: Array[Byte], p: Long): Long =
    (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (b((p + i).toInt) & 0xFFL))

  /** Parse one MP4/QuickTime payload's container metadata, or None when
    * the bytes aren't ISO-BMFF (no ftyp/moov box at the top level).
    */
  private def parseIsoBmff(bytes: Array[Byte]): Option[VideoMeta] = {
    var brand: String = null
    var durationSec: java.lang.Double = null
    var nTracks = 0
    var hasVideo = false
    var hasAudio = false
    var width: java.lang.Integer = null
    var height: java.lang.Integer = null
    var codec: String = null
    var sawMoov = false
    // per-trak state: hdlr arrives after tkhd inside the same trak box
    var trakW: java.lang.Integer = null
    var trakH: java.lang.Integer = null
    var trakCodec: String = null
    var trakKind: String = null
    def closeTrak(): Unit = {
      if (trakKind == "vide") {
        hasVideo = true
        if (width == null) { width = trakW; height = trakH; codec = trakCodec }
      } else if (trakKind == "soun") hasAudio = true
      trakW = null; trakH = null; trakCodec = null; trakKind = null
    }
    try {
      walkBoxes(bytes, 0L, bytes.length.toLong) { (typ, from, to) =>
        typ match {
          case "ftyp" if to - from >= 4 =>
            brand = new String(bytes, from.toInt, 4, "ISO-8859-1").trim
          case "moov" => sawMoov = true
          case "mvhd" if to - from >= 4 =>
            val v = bytes(from.toInt) & 0xFF
            if (v == 1 && to - from >= 32) {
              val ts = be32(bytes, from + 20)
              val dur = be64(bytes, from + 24)
              if (ts > 0) durationSec = dur.toDouble / ts
            } else if (v == 0 && to - from >= 20) {
              val ts = be32(bytes, from + 12)
              val dur = be32(bytes, from + 16)
              if (ts > 0) durationSec = dur.toDouble / ts
            }
          case "trak" =>
            closeTrak() // finalize the previous trak before the next
            nTracks += 1
          case "tkhd" if to - from >= 4 =>
            val v = bytes(from.toInt) & 0xFF
            // width/height: 16.16 fixed point, last 8 payload bytes
            val base = from + (if (v == 1) 4 + 32 else 4 + 20) + 8 + 8 + 36
            if (base + 8 <= to) {
              trakW = Int.box((be32(bytes, base) >> 16).toInt)
              trakH = Int.box((be32(bytes, base + 4) >> 16).toInt)
            }
          case "hdlr" if to - from >= 12 =>
            trakKind = new String(bytes, from.toInt + 8, 4, "ISO-8859-1")
          case "stsd" if to - from >= 16 =>
            // version/flags(4) entry_count(4) entry_size(4) format(4cc)
            trakCodec = new String(bytes, from.toInt + 12, 4, "ISO-8859-1").trim
          case _ => ()
        }
      }
      closeTrak()
      if (brand == null && !sawMoov) None
      else Some(VideoMeta(brand, durationSec, nTracks, hasVideo, hasAudio,
        width, height, codec))
    } catch { case _: Exception => None }
  }

  /** REAL video container demux — a plain-bytes ISO-BMFF (MP4/MOV/M4V)
    * box walk per the public ISO 14496-12 layout, no libraries: emits
    * the ftyp major brand, movie duration (mvhd timescale/duration),
    * track count, whether video/audio tracks exist (hdlr), the first
    * video track's pixel dimensions (tkhd 16.16 fixed point) and its
    * sample-entry codec fourcc (stsd). This is the metadata corpus
    * filters key on (duration caps, resolution floors, codec
    * allow-lists). FRAME decode is REAL for MJPEG-family tracks via
    * [[decodeVideoFrames]]; compressed codecs (H.264+) remain
    * [[stubFrameSample]] — the JVM ships no inter-frame video codec.
    * Non-ISO-BMFF bytes yield NULLs (the honest signal). Same
    * partition-batched contract as [[decodeImage]].
    */
  def parseVideoContainer(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("container", StringType, nullable = true),
      StructField("duration_sec", DoubleType, nullable = true),
      StructField("n_tracks", IntegerType, nullable = true),
      StructField("has_video", BooleanType, nullable = true),
      StructField("has_audio", BooleanType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("codec", StringType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        parseIsoBmff(row.getAs[Array[Byte]](binIdx)) match {
          case Some(m) =>
            Row.fromSeq(row.toSeq ++ Seq(m.container, m.durationSec,
              Int.box(m.nTracks), m.hasVideo, m.hasAudio, m.width, m.height,
              m.codec))
          case None =>
            Row.fromSeq(row.toSeq ++
              Seq(null, null, null, null, null, null, null, null))
        }
      }
    }
  }

  /** The first video trak's sample layout: stsd fourcc + each sample's
    * absolute (offset, size) in the payload, reconstructed from the
    * stsz/stsc/stco(co64) tables per ISO 14496-12 §8.5-8.7.
    */
  private case class SampleTable(codec: String,
      samples: IndexedSeq[(Long, Int)])

  /** Demux the first 'vide' trak's sample table. The chunk walk is the
    * real one: stsc maps chunk runs to samples-per-chunk, stco/co64
    * give chunk base offsets, and a sample's offset is its chunk base
    * plus the sizes of the samples before it in that chunk.
    */
  private def findVideoSampleTable(bytes: Array[Byte]): Option[SampleTable] = {
    var result: Option[SampleTable] = None
    // per-trak box payload ranges (parsed only if the trak is 'vide')
    var kind: String = null
    var fourcc: String = null
    var stsz: (Long, Long) = null
    var stsc: (Long, Long) = null
    var stco: (Long, Long) = null
    var co64: (Long, Long) = null
    def closeTrak(): Unit = {
      if (result.isEmpty && kind == "vide" && fourcc != null &&
          stsz != null && stsc != null && (stco != null || co64 != null))
        result = buildSampleTable(bytes, fourcc, stsz, stsc, stco, co64)
      kind = null; fourcc = null; stsz = null; stsc = null
      stco = null; co64 = null
    }
    try {
      walkBoxes(bytes, 0L, bytes.length.toLong) { (typ, from, to) =>
        typ match {
          case "trak" => closeTrak()
          case "hdlr" if to - from >= 12 =>
            kind = new String(bytes, from.toInt + 8, 4, "ISO-8859-1")
          case "stsd" if to - from >= 16 =>
            fourcc = new String(bytes, from.toInt + 12, 4, "ISO-8859-1").trim
          case "stsz" => stsz = (from, to)
          case "stsc" => stsc = (from, to)
          case "stco" => stco = (from, to)
          case "co64" => co64 = (from, to)
          case _ => ()
        }
      }
      closeTrak()
      result
    } catch { case _: Exception => None }
  }

  private def buildSampleTable(bytes: Array[Byte], fourcc: String,
      stsz: (Long, Long), stsc: (Long, Long), stco: (Long, Long),
      co64: (Long, Long)): Option[SampleTable] = {
    // stsz: version/flags(4) sample_size(4) sample_count(4) [sizes...]
    if (stsz._2 - stsz._1 < 12) return None
    val uniform = be32(bytes, stsz._1 + 4)
    val nSamples = be32(bytes, stsz._1 + 8).toInt
    if (nSamples <= 0) return None
    def sizeOf(i: Int): Int =
      if (uniform != 0) uniform.toInt
      else if (stsz._1 + 12 + (i + 1) * 4L <= stsz._2)
        be32(bytes, stsz._1 + 12 + i * 4L).toInt
      else -1
    // chunk offsets: stco 32-bit or co64 64-bit
    val (coFrom, coTo, coW) =
      if (stco != null) (stco._1, stco._2, 4) else (co64._1, co64._2, 8)
    if (coTo - coFrom < 8) return None
    val nChunks = be32(bytes, coFrom + 4).toInt
    def chunkOff(c: Int): Long =
      if (coW == 4) be32(bytes, coFrom + 8 + c * 4L)
      else be64(bytes, coFrom + 8 + c * 8L)
    if (nChunks <= 0 || coFrom + 8 + nChunks.toLong * coW > coTo) return None
    // stsc: version/flags(4) entry_count(4) then
    // (first_chunk, samples_per_chunk, sample_description_index) runs
    if (stsc._2 - stsc._1 < 8) return None
    val nRuns = be32(bytes, stsc._1 + 4).toInt
    if (nRuns <= 0 || stsc._1 + 8 + nRuns.toLong * 12 > stsc._2) return None
    def run(i: Int): (Int, Int) = (
      be32(bytes, stsc._1 + 8 + i * 12L).toInt, // first_chunk, 1-based
      be32(bytes, stsc._1 + 8 + i * 12L + 4).toInt) // samples_per_chunk
    val out = IndexedSeq.newBuilder[(Long, Int)]
    var s = 0
    var r = 0
    var c = 1 // chunks are 1-based
    while (c <= nChunks && s < nSamples) {
      while (r + 1 < nRuns && run(r + 1)._1 <= c) r += 1
      val perChunk = run(r)._2
      var off = chunkOff(c - 1)
      var k = 0
      while (k < perChunk && s < nSamples) {
        val sz = sizeOf(s)
        if (sz < 0 || off < 0 || off + sz > bytes.length) return None
        out += ((off, sz))
        off += sz
        s += 1; k += 1
      }
      c += 1
    }
    val samples = out.result()
    if (samples.isEmpty) None else Some(SampleTable(fourcc, samples))
  }

  /** Codec fourccs whose sample data is a self-contained JPEG bitstream
    * the JDK can decode: MJPEG in its 'jpeg'/'mjpa' QuickTime spelling
    * and the 'mp4v' entries some MJPEG muxers emit. Anything else
    * (H.264 'avc1', HEVC 'hvc1', ...) has no JVM codec — those payloads
    * yield NULL frames, the honest signal, with the codec name still
    * reported by [[parseVideoContainer]].
    */
  private val jpegFourccs = Set("jpeg", "mjpa", "mp4v")

  /** REAL video FRAME decode for codec-free (MJPEG-family) tracks: demux
    * the first video trak's sample table ([[findVideoSampleTable]] —
    * true stsz/stsc/stco chunk math, not an offset guess), pick up to
    * `maxFrames` samples evenly spaced across the track, and decode each
    * through the same javax.imageio path as [[decodeImage]], emitting
    * ONE ROW PER FRAME with (frame_idx, sample_idx, width, height,
    * channels, features). Payloads that aren't ISO-BMFF, have no video
    * trak, or carry a codec the JVM can't decode emit one row with NULL
    * frame columns. Per-partition batching as everywhere else; the
    * explode is bounded by `maxFrames`.
    */
  def decodeVideoFrames(df: DataFrame, binCol: String, maxFrames: Int = 4,
      dim: Int = 16): DataFrame = {
    val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"dim must be a square, got $dim")
    require(maxFrames >= 1, s"maxFrames must be positive, got $maxFrames")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("sample_idx", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val decoded = findVideoSampleTable(bytes) match {
          case Some(t) if jpegFourccs(t.codec) =>
            val n = t.samples.length
            val take = math.min(maxFrames, n)
            // evenly spaced sample picks across the track (first..last)
            val picks = (0 until take).map(i =>
              if (take == 1) 0 else (i.toLong * (n - 1) / (take - 1)).toInt)
            picks.zipWithIndex.flatMap { case (sIdx, fIdx) =>
              val (off, sz) = t.samples(sIdx)
              imageStats(bytes, off.toInt, sz, grid, dim).map {
                case (w, h, ch, feats) =>
                  Row.fromSeq(row.toSeq ++
                    Seq(fIdx, sIdx, w, h, ch, feats))
              }
            }
          case _ => Nil
        }
        if (decoded.nonEmpty) decoded
        else Iterator.single(Row.fromSeq(row.toSeq ++
          Seq(null, null, null, null, null, null)))
      }
    }
  }

  /** REAL animated-GIF frame decode via javax.imageio's multi-image
    * GIF reader (the JDK reader exposes every animation frame through
    * `getNumImages`/`read(i)` — no external codec): up to `maxFrames`
    * frames evenly spaced across the animation, ONE ROW PER FRAME with
    * (frame_idx, sample_idx, n_frames, width, height, channels,
    * features) through the same grid-luminance pooling as
    * [[decodeImage]]. Frames decode AS STORED — an optimized GIF's
    * delta rects are not composited onto the logical screen
    * (compositing is a presentation concern; dedup/features key on
    * content identity, and the stored rect IS the frame's content).
    * Non-GIF or undecodable payloads emit one row with NULL frame
    * columns. Partition-batched like every decoder here.
    */
  def decodeGifFrames(df: DataFrame, binCol: String, maxFrames: Int = 4,
      dim: Int = 16): DataFrame = {
    val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"dim must be a square, got $dim")
    require(maxFrames >= 1, s"maxFrames must be positive, got $maxFrames")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = true),
      StructField("sample_idx", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val decoded: Seq[Row] =
          if (bytes == null || bytes.length < 6 ||
              !(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')) Nil
          else {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); Nil }
            else {
              val r = readers.next()
              try {
                r.setInput(iis, false, false)
                val n = r.getNumImages(true)
                val take = math.min(maxFrames, n)
                val picks = (0 until take).map(i =>
                  if (take == 1) 0 else (i.toLong * (n - 1) / (take - 1)).toInt)
                picks.zipWithIndex.flatMap { case (sIdx, fIdx) =>
                  try {
                    val (w, h, ch, feats) =
                      bufferedStats(r.read(sIdx), grid, dim)
                    Some(Row.fromSeq(row.toSeq ++
                      Seq(fIdx, sIdx, n, w, h, ch, feats)))
                  } catch { case _: Exception => None }
                }
              } catch { case _: Exception => Nil }
              finally { r.dispose(); iis.close() }
            }
          }
        if (decoded.nonEmpty) decoded
        else Iterator.single(Row.fromSeq(row.toSeq ++
          Seq(null, null, null, null, null, null, null)))
      }
    }
  }

  // ─────────────────────────────────────────────────────────────────
  // STUB decoders — deterministic fakes standing in for codecs the JVM
  // lacks (inter-frame video codecs like H.264; compressed audio). A
  // production build replaces the byte math with e.g. a JNI decode; the
  // mapPartitions batch shape and output schema stay identical. Images
  // use the REAL [[decodeImage]] above; PCM audio the REAL
  // [[decodeAudio]]; video CONTAINER metadata the REAL
  // [[parseVideoContainer]]; MJPEG-track frames the REAL
  // [[decodeVideoFrames]].
  // ─────────────────────────────────────────────────────────────────

  /** "Decode" an image binary into (width, height, channels) +
    * `dim`-float feature vector. STUB: dimensions and features are
    * hashed from the payload bytes.
    */
  def stubDecodeImage(df: DataFrame, binCol: String,
      dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      // partition-batched: a real decoder would init its codec once here
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
        val w = 64 + math.abs(h % 960)
        val ht = 64 + math.abs((h / 7) % 960)
        val feats = Array.tabulate(dim)(i =>
          (scala.util.hashing.MurmurHash3.bytesHash(bytes, i) / 2.147483647e9).toFloat)
        Row.fromSeq(row.toSeq ++ Seq(w, ht, 3, feats))
      }
    }
  }

  /** "Resize": STUB that rescales the fake dimensions and re-derives
    * features — keeps the real pipeline contract (resize after decode,
    * before feature extraction).
    */
  def stubResize(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast(DoubleType) /
        greatest(col("width"), col("height")).cast(DoubleType))
    df.withColumn("width", (col("width") * scale).cast(IntegerType))
      .withColumn("height", (col("height") * scale).cast(IntegerType))
  }

  /** "Frame-sample" a video binary into `n` frames, one row per frame.
    * STUB: each frame hashes a distinct byte slice. The explode shape
    * (row → n rows, lineage keyed by content_id + frame_idx) is real.
    */
  def stubFrameSample(df: DataFrame, binCol: String, n: Int): DataFrame = {
    val frames = (0 until n).map { i =>
      struct(lit(i).as("frame_idx"),
        xxhash64(col(binCol), lit(i)).as("frame_id"))
    }
    df.withColumn("frame", explode(array(frames: _*)))
      .withColumn("frame_idx", col("frame.frame_idx"))
      .withColumn("frame_id", col("frame.frame_id"))
      .drop("frame")
  }

  /** REAL perceptual average-hash (aHash) over decoded pixels: mean-pool
    * luminance to an 8×8 grid, set bit i when cell i is brighter than
    * the grid mean — the classic 64-bit fingerprint that survives
    * re-encoding, resizing and mild brightness shifts (all of which
    * change every byte, so content-id/exact dedup misses them).
    * Appends (width, height, phash); bytes no codec accepts yield NULLs.
    * Same partition-batched `mapPartitions` contract as [[decodeImage]].
    */
  def imagePHash(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("phash", LongType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        imageStats(bytes, 0, bytes.length, 8, 64) match {
          case Some((w, h, _, feats)) =>
            var mean = 0.0
            var i = 0
            while (i < 64) { mean += feats(i); i += 1 }
            mean /= 64.0
            var bits = 0L
            i = 0
            while (i < 64) {
              if (feats(i) > mean) bits |= (1L << i)
              i += 1
            }
            Row.fromSeq(row.toSeq ++ Seq(w, h, bits))
          case None => Row.fromSeq(row.toSeq ++ Seq(null, null, null))
        }
      }
    }
  }

  /** Image near-dup pairs by banded pHash self-join — the
    * [[graft.operators.Dedup.simhashPairs]] shape on the 64-bit aHash:
    * four 16-bit bands block the join (pigeonhole: hamming ≤ 3 pairs
    * MUST agree on ≥ 1 band, so the default is recall-complete), then
    * one `bit_count(xor)` verifies. Undecodable images drop out before
    * the join. Scale shape: banded buckets, never all-pairs; the
    * fingerprint table is 1 long per image, so both join sides are
    * narrow whatever the payload bytes weighed.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] for 4-band recall-completeness, " +
        s"got $maxHamming")
    val ph = imagePHash(df.select(col(idCol), col(binCol)), binCol)
      .filter(col("phash").isNotNull)
      .select(col(idCol).as("id"), col("phash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = ph.select(col("id"), col("phash"),
      posexplode(array((0 until 4).map(b =>
        expr(s"(phash >> ${b * 16}) & 65535")): _*))
        .as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(ph_a ^ ph_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Scene-cut KEYFRAME detection over decoded frame features — the
    * frame-sampling step of a video training pipeline ("keep one frame
    * per scene, not one per timestamp"). Works on ANY frame source
    * here ([[decodeGifFrames]], [[decodeVideoFrames]], stub decoders):
    * per frame, an aHash over the pooled-luminance grid (bit i set iff
    * feats[i] > the frame's own mean — brightness-shift tolerant, like
    * [[imagePHash]] but expression-only, no second decode); per video,
    * a lag window compares consecutive hashes and flags a keyframe
    * where the Hamming distance jumps ≥ `threshold` (scene cut) —
    * frame 0 is always a keyframe.
    *
    * Fully declarative: the hash is a fixed `dim`-term CASE sum, the
    * cut test one `bit_count(xor)` against `lag` — everything stays in
    * whole-stage codegen, ONE shuffle on the video id. Rows with NULL
    * features (undecodable payloads) are dropped.
    */
  def keyframes(frames: DataFrame, idCol: String, frameIdxCol: String,
      featCol: String, dim: Int = 16, threshold: Int = 4): DataFrame = {
    require(dim >= 1 && dim <= 63, s"dim must be in [1, 63], got $dim")
    val mean = aggregate(col(featCol), lit(0.0),
      (a, x) => a + x.cast("double")) / size(col(featCol)).cast("double")
    val hash = (0 until dim).map(p =>
      when(element_at(col(featCol), p + 1).cast("double") >
        col("__mean"), lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(frameIdxCol)
    frames.filter(col(featCol).isNotNull)
      .withColumn("__mean", mean)
      .withColumn("fhash", hash)
      .withColumn("__prev", lag(col("fhash"), 1).over(w))
      .withColumn("dist_prev", expr("bit_count(fhash ^ __prev)"))
      .withColumn("is_keyframe",
        col("__prev").isNull || col("dist_prev") >= threshold)
      .select(col(idCol), col(frameIdxCol), col("fhash"),
        col("dist_prev"), col("is_keyframe"))
  }
}
