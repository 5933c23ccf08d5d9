package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // binary payloads synthesized from text (no media files in testdata)
  private lazy val media = graft.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .limit(50)
    .select($"doc_id", encode($"text", "UTF-8").as("payload"))

  test("withMeta attaches kind/bytes/content_id struct") {
    val out = Multimodal.withMeta(media, "payload", "image")
    assert(out.schema("media_meta").dataType == Multimodal.metaSchema)
    val r = out.select("media_meta.kind", "media_meta.n_bytes").head()
    assert(r.getString(0) == "image" && r.getLong(1) > 0)
  }

  test("stub image decode: schema, determinism, feature shape") {
    val out = Multimodal.stubDecodeImage(media, "payload", dim = 16)
    val rows = out.select("doc_id", "width", "height", "channels", "features")
      .collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getInt(3) == 3))
    assert(rows.forall(_.getSeq[Float](4).length == 16))
    // determinism: same payload → same features
    val again = Multimodal.stubDecodeImage(media, "payload", dim = 16)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Float](4)))
  }

  test("stub resize clamps the longest side") {
    val out = Multimodal.stubResize(
      Multimodal.stubDecodeImage(media, "payload"), maxSide = 128)
    assert(out.select(greatest($"width", $"height")).collect()
      .forall(_.getInt(0) <= 128))
  }

  test("frame sampling explodes n rows per video with stable ids") {
    val out = Multimodal.stubFrameSample(media, "payload", n = 4)
    assert(out.count() == 200)
    val perDoc = out.groupBy("doc_id").agg(
      countDistinct("frame_idx").as("n"),
      countDistinct("frame_id").as("ids")).collect()
    assert(perDoc.forall(r => r.getLong(1) == 4L && r.getLong(2) == 4L))
  }

  test("REAL decode: checked-in PNG fixture via javax.imageio") {
    // 8x6 PNG, left half white / right half black (test resource)
    val in = getClass.getResourceAsStream("/graft/half_white_8x6.png")
    val bytes = in.readAllBytes(); in.close()
    val df = Seq((1L, bytes)).toDF("id", "img")
    val out = Multimodal.decodeImage(df, "img", dim = 4)
      .select("width", "height", "channels", "features").head()
    assert(out.getInt(0) == 8 && out.getInt(1) == 6 && out.getInt(2) == 3)
    // 2x2 grid mean luminance: left column pure white (1.0), right 0.0
    assert(out.getSeq[Float](3) == Seq(1.0f, 0.0f, 1.0f, 0.0f))
  }

  test("REAL decode: JPEG round-trip and junk-byte nulls") {
    // encode a gradient through the JDK's own JPEG codec
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if ((x / 8 + y / 8) % 2 == 0) 0xFFFFFF else 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val df = Seq((1L, bos.toByteArray), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "img")
    val rows = Multimodal.decodeImage(df, "img", dim = 4)
      .select("id", "width", "height", "features").orderBy("id").collect()
    assert(rows(0).getInt(1) == 16 && rows(0).getInt(2) == 16)
    val f = rows(0).getSeq[Float](3)
    // checkerboard: diagonal cells bright, off-diagonal dark (JPEG is
    // lossy — assert the contrast, not exact values)
    assert(f(0) > 0.8f && f(3) > 0.8f && f(1) < 0.2f && f(2) < 0.2f)
    // junk bytes: no codec accepts them -> honest NULLs
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(3))
  }

  test("REAL audio decode: checked-in WAV fixture via javax.sound.sampled") {
    // 0.25 s of a 440 Hz sine, mono, 8 kHz, 16-bit PCM, amplitude 12000
    val in = getClass.getResourceAsStream("/graft/tone_440_8k.wav")
    val bytes = in.readAllBytes(); in.close()
    val df = Seq((1L, bytes), (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "audio")
    val rows = Multimodal.decodeAudio(df, "audio", nWindows = 8)
      .select("id", "sample_rate", "n_channels", "n_frames", "duration_sec",
        "features")
      .orderBy("id").collect()
    val r = rows(0)
    assert(r.getFloat(1) == 8000f)
    assert(r.getInt(2) == 1)
    assert(r.getLong(3) == 2000L)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-9)
    val f = r.getSeq[Float](5)
    assert(f.length == 8)
    // RMS of a sine at amplitude 12000/32768 is ~0.259 in every window
    assert(f.forall(v => v > 0.25f && v < 0.27f), f.mkString(","))
    // junk bytes: no codec accepts them -> honest NULLs
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(5))
  }

  test("audio decode handles stereo and sub-frame windows") {
    // synthesize a 2-channel 16-bit WAV in memory: left silent, right
    // full-scale square — the mono mix halves the square's RMS
    val sr = 4000f
    val n = 400
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 2, true, false)
    val pcm = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val right = if (i % 2 == 0) 16384 else -16384
      pcm(i * 4 + 2) = (right & 0xFF).toByte
      pcm(i * 4 + 3) = ((right >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "audio")
    val r = Multimodal.decodeAudio(df, "audio", nWindows = 4)
      .select("sample_rate", "n_channels", "n_frames", "features").head()
    assert(r.getFloat(0) == 4000f && r.getInt(1) == 2 && r.getLong(2) == 400L)
    val f = r.getSeq[Float](3)
    // mix = (0 + ±0.5)/2 -> RMS 0.25 per window
    assert(f.forall(v => math.abs(v - 0.25f) < 1e-3), f.mkString(","))
  }

  // minimal spec-conformant ISO-BMFF builder (box = size+type+payload)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
    bb.array()
  }
  private def be32(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()

  test("REAL video container demux: hand-built MP4 box tree") {
    // mvhd v0: timescale 1000, duration 5000 -> 5.0 s
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0))
    // tkhd v0: width 640, height 360 as 16.16 fixed at payload end
    val tkhd = box("tkhd", Array.fill[Byte](4 + 20 + 8 + 8 + 36)(0),
      be32(640L << 16), be32(360L << 16))
    def hdlr(kind: String) = box("hdlr", Array.fill[Byte](8)(0),
      kind.getBytes("ISO-8859-1"), Array.fill[Byte](13)(0))
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1),
      be32(16), "avc1".getBytes("ISO-8859-1"), Array.fill[Byte](8)(0))
    val videoTrak = box("trak", tkhd,
      box("mdia", hdlr("vide"), box("minf", box("stbl", stsd))))
    val audioTrak = box("trak", box("mdia", hdlr("soun")))
    val mp4 = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(0x200)) ++
      box("moov", mvhd, videoTrak, audioTrak) ++
      box("mdat", Array.fill[Byte](32)(7))
    val df = Seq((1L, mp4), (2L, "not a video at all".getBytes)).toDF("id", "v")
    val out = Multimodal.parseVideoContainer(df, "v").orderBy("id").collect()
    val m = out(0)
    assert(m.getString(2) == "isom", m.toString)       // container
    assert(m.getDouble(3) == 5.0)                      // duration_sec
    assert(m.getInt(4) == 2)                           // n_tracks
    assert(m.getBoolean(5) && m.getBoolean(6))         // video + audio
    assert(m.getInt(7) == 640 && m.getInt(8) == 360)   // dimensions
    assert(m.getString(9) == "avc1")                   // codec fourcc
    // junk bytes -> all-null metadata, no exception
    assert((2 to 9).forall(out(1).isNullAt))
  }

  test("REAL MJPEG frame decode: stsz/stsc/stco demux + imageio") {
    // three 8x8 JPEG frames at distinct gray levels, laid out as TWO
    // chunks (frames 0-1 then frame 2, with a gap between) so the
    // demux must walk stsc runs and accumulate sizes within a chunk —
    // the real ISO 14496-12 sample math, not offset guessing
    def jpegOf(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(jpegOf(0), jpegOf(128), jpegOf(255))
    val gap = Array.fill[Byte](5)(9)
    def hdlr(kind: String) = box("hdlr", Array.fill[Byte](8)(0),
      kind.getBytes("ISO-8859-1"), Array.fill[Byte](13)(0))
    def moovWith(off1: Long, off2: Long): Array[Byte] = {
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1),
        be32(16), "jpeg".getBytes("ISO-8859-1"), Array.fill[Byte](8)(0))
      val stsz = box("stsz", Array[Byte](0, 0, 0, 0), be32(0), be32(3),
        be32(frames(0).length), be32(frames(1).length),
        be32(frames(2).length))
      val stsc = box("stsc", Array[Byte](0, 0, 0, 0), be32(2),
        be32(1), be32(2), be32(1), // chunk 1: 2 samples
        be32(2), be32(1), be32(1)) // chunk 2+: 1 sample
      val stco = box("stco", Array[Byte](0, 0, 0, 0), be32(2),
        be32(off1), be32(off2))
      box("moov", box("trak", box("mdia", hdlr("vide"),
        box("minf", box("stbl", stsd, stsz, stsc, stco)))))
    }
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(0x200))
    // stco offsets are absolute: size the moov with placeholders first
    // (the box sizes don't depend on the offset VALUES), then rebuild
    val base = ftyp.length + moovWith(0, 0).length + 8
    val off2 = base + frames(0).length + frames(1).length + gap.length
    val mp4 = ftyp ++ moovWith(base, off2) ++
      box("mdat", frames(0) ++ frames(1) ++ gap ++ frames(2))
    val df = Seq((1L, mp4), (2L, "junk".getBytes)).toDF("id", "v")
    val rows = Multimodal.decodeVideoFrames(df, "v", maxFrames = 3, dim = 4)
      .select("id", "frame_idx", "sample_idx", "width", "height",
        "channels", "features")
      .orderBy("id", "frame_idx").collect()
    assert(rows.length == 4, rows.mkString("\n")) // 3 frames + 1 null row
    val fr = rows.take(3)
    assert(fr.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(fr.map(_.getInt(2)).toSeq == Seq(0, 1, 2))
    assert(fr.forall(r => r.getInt(3) == 8 && r.getInt(4) == 8 &&
      r.getInt(5) == 3))
    // gray levels survive the lossy round-trip as mean luminance order
    val lums = fr.map(_.getSeq[Float](6).sum / 4)
    assert(lums(0) < 0.1f && math.abs(lums(1) - 0.5f) < 0.1f &&
      lums(2) > 0.9f, lums.mkString(","))
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(6))
    // even spacing: maxFrames=2 picks the FIRST and LAST samples
    val two = Multimodal.decodeVideoFrames(
      Seq((1L, mp4)).toDF("id", "v"), "v", maxFrames = 2, dim = 4)
      .select("sample_idx").orderBy("sample_idx").collect()
    assert(two.map(_.getInt(0)).toSeq == Seq(0, 2))
  }

  test("REAL animated-GIF frame decode: every frame via the JDK gif reader") {
    // build a 3-frame animated GIF with the JDK's own sequence writer:
    // frame gray levels 0, 128, 255 at 8x8
    def frame(gray: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, 8, 8); g.dispose()
      img
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val w = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    Seq(0, 128, 255).foreach { gLev =>
      w.writeToSequence(
        new javax.imageio.IIOImage(frame(gLev), null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    val gif = baos.toByteArray
    val df = Seq((1L, gif), (2L, "not a gif".getBytes("UTF-8")))
      .toDF("id", "vid")
    val out = Multimodal.decodeGifFrames(df, "vid", maxFrames = 3, dim = 4)
      .orderBy("id", "frame_idx").collect()
    // row layout: (id, vid, frame_idx, sample_idx, n_frames, w, h, ch, feats)
    val frames = out.filter(_.getLong(0) == 1L)
    assert(frames.length == 3)
    assert(frames.map(_.getInt(2)).toSeq == Seq(0, 1, 2)) // frame_idx
    assert(frames.map(_.getInt(3)).toSeq == Seq(0, 1, 2)) // sample_idx
    assert(frames.forall(_.getInt(4) == 3)) // n_frames
    assert(frames.forall(r => r.getInt(5) == 8 && r.getInt(6) == 8))
    // mean luminance tracks the frame gray level (GIF palettes quantize,
    // so compare loosely)
    val lums = frames.map(_.getSeq[Float](8).head)
    assert(lums(0) < 0.1f && math.abs(lums(1) - 0.5f) < 0.1f &&
      lums(2) > 0.9f, lums.toSeq.toString)
    // evenly-spaced picks when maxFrames < n: 3 frames, take 2 → 0 and 2
    val two = Multimodal.decodeGifFrames(df.filter($"id" === 1L), "vid",
      maxFrames = 2, dim = 4).orderBy("frame_idx").collect()
    assert(two.map(_.getInt(3)).toSeq == Seq(0, 2))
    // the non-GIF payload is one honest NULL row
    val bad = out.filter(_.getLong(0) == 2L)
    assert(bad.length == 1 && bad.head.isNullAt(2) && bad.head.isNullAt(8))
  }

  test("video frame decode leaves non-MJPEG codecs honestly null") {
    // the avc1 container from the demux test: sample TABLES absent, so
    // the fourcc gate never even fires — and a jpeg-fourcc track whose
    // sample bytes are not JPEG decodes to nothing -> one null row
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
      be32(1000), be32(5000), Array.fill[Byte](80)(0))
    def hdlr(kind: String) = box("hdlr", Array.fill[Byte](8)(0),
      kind.getBytes("ISO-8859-1"), Array.fill[Byte](13)(0))
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1),
      be32(16), "avc1".getBytes("ISO-8859-1"), Array.fill[Byte](8)(0))
    val mp4 = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(0x200)) ++
      box("moov", mvhd, box("trak", box("mdia", hdlr("vide"),
        box("minf", box("stbl", stsd))))) ++
      box("mdat", Array.fill[Byte](32)(7))
    val rows = Multimodal.decodeVideoFrames(
      Seq((1L, mp4)).toDF("id", "v"), "v")
      .select("frame_idx", "width", "features").collect()
    assert(rows.length == 1 && (0 to 2).forall(rows(0).isNullAt))
  }

  test("decoded media features feed similarity search end-to-end") {
    val feats = Multimodal.stubDecodeImage(media, "payload", dim = 16)
      .select($"doc_id", $"features")
    val q = feats.filter($"doc_id" === feats.select(min($"doc_id")).head().getLong(0))
      .select($"features".cast("array<double>")).head().getSeq[Double](0)
    val topk = graft.operators.Similarity.cosineTopK(
      feats, "doc_id", "features", q, 5).collect()
    assert(topk.length == 5)
    // the query image itself ranks first with similarity 1.0
    assert(math.abs(topk.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("pHash near-dup: re-encode/resize survive, distinct content does not") {
    def render(w: Int, h: Int, invert: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // asymmetric two-tone pattern: bright iff left-of-diagonal
        val bright = (x.toDouble / w + y.toDouble / h) < 0.9
        img.setRGB(x, y, if (bright ^ invert) 0xFFFFFF else 0x000000)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val base = render(64, 64, invert = false)
    val df = Seq(
      (1L, enc(base, "png")),
      (2L, enc(base, "jpg")),                       // lossy re-encode
      (3L, enc(render(32, 32, invert = false), "png")), // resized copy
      (4L, enc(render(64, 64, invert = true), "png")),  // inverted content
      (5L, Array[Byte](1, 2, 3)))                   // undecodable
      .toDF("id", "img")
    val pairs = Multimodal.imageNearDupPairs(df, "id", "img", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1↔2 (re-encode) and 1↔3, 2↔3 (resize) are near-dups; the inverted
    // image (its pHash is ~the complement) and the junk row never pair
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // the inverted pattern really is far in hamming, not just missed by
    // banding: compare fingerprints directly
    val ph = Multimodal.imagePHash(df, "img")
      .select("id", "phash").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(ph(5L).isEmpty)
    assert(java.lang.Long.bitCount(ph(1L).get ^ ph(4L).get) > 32)
  }

  test("keyframes: scene cuts flagged, steady frames not") {
    val frames = Seq(
      (1L, 0, Some(Array(10f, 0f, 10f, 0f))), // hash 0b0101
      (1L, 1, Some(Array(10f, 0f, 10f, 0.5f))), // same bits → no cut
      (1L, 2, Some(Array(0f, 10f, 0f, 10f))), // inverted → cut (d=4)
      (2L, 0, Some(Array(1f, 2f, 3f, 4f))), // lone frame → keyframe
      (3L, 0, None)) // undecodable → dropped
      .toDF("vid_id", "frame_idx", "features")
    val out = Multimodal.keyframes(frames, "vid_id", "frame_idx",
        "features", dim = 4, threshold = 2)
      .orderBy("vid_id", "frame_idx").collect()
    assert(out.length == 4)
    val kf = out.map(r => (r.getLong(0), r.getInt(1)) ->
      r.getAs[Boolean]("is_keyframe")).toMap
    assert(kf((1L, 0)) && !kf((1L, 1)) && kf((1L, 2)) && kf((2L, 0)))
    val h = out.map(r => (r.getLong(0), r.getInt(1)) ->
      r.getAs[Long]("fhash")).toMap
    assert(h((1L, 0)) == 5L && h((1L, 1)) == 5L && h((1L, 2)) == 10L)
  }

  test("keyframes end-to-end on a real animated GIF: cut at the scene change") {
    // 4 frames: two with black-left/white-right, two inverted — the
    // scene change lands at frame 2
    def frame(invert: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(if (invert) java.awt.Color.WHITE else java.awt.Color.BLACK)
      g.fillRect(0, 0, 4, 8)
      g.setColor(if (invert) java.awt.Color.BLACK else java.awt.Color.WHITE)
      g.fillRect(4, 0, 4, 8)
      g.dispose(); img
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val w = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    Seq(false, false, true, true).foreach { inv =>
      w.writeToSequence(
        new javax.imageio.IIOImage(frame(inv), null, null), null)
    }
    w.endWriteSequence(); w.dispose(); ios.close()
    val df = Seq((7L, baos.toByteArray)).toDF("id", "vid")
    val decoded = Multimodal.decodeGifFrames(df, "vid", maxFrames = 4,
      dim = 4)
    val out = Multimodal.keyframes(decoded, "id", "frame_idx",
        "features", dim = 4, threshold = 2)
      .orderBy("frame_idx").collect()
      .map(r => r.getInt(1) -> r.getAs[Boolean]("is_keyframe")).toMap
    assert(out == Map(0 -> true, 1 -> false, 2 -> true, 3 -> false))
  }
}
