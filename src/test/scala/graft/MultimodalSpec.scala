package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing: stub decode determinism, feature
  * vector shape, frame sampling, and the batched processing path. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = (1L to 10L).map { i =>
    (i, "image", Array.tabulate(256)(b => ((b * i) % 251).toByte))
  }.toDF("media_id", "media_type", "payload")

  test("decode stub is deterministic with plausible dimensions") {
    val d1 = media.select($"media_id", Multimodal.decodeStub($"payload").as("meta"))
      .select($"media_id", $"meta.width", $"meta.height", $"meta.duration_ms")
      .collect()
    val d2 = media.select($"media_id", Multimodal.decodeStub($"payload").as("meta"))
      .select($"media_id", $"meta.width", $"meta.height", $"meta.duration_ms")
      .collect()
    assert(d1.toSeq == d2.toSeq)
    d1.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
    }
  }

  test("feature extraction emits fixed-dim bounded vectors") {
    val f = media.select(Multimodal.featureExtract($"payload", 32).as("feat"))
      .collect()
    f.foreach { r =>
      val v = r.getSeq[Double](0)
      assert(v.length == 32)
      assert(v.forall(x => x >= -1.0 && x <= 1.0))
    }
  }

  test("resize stub preserves aspect ratio within the target box") {
    val out = media.select(Multimodal.decodeStub($"payload").as("meta"))
      .select(Multimodal.resizeStub($"meta", 640, 480).as("r"), $"meta")
      .collect()
    out.foreach { row =>
      val r = row.getStruct(0)
      val m = row.getStruct(1)
      val (w, h) = (r.getInt(0), r.getInt(1))
      assert(w <= 640 && h <= 480 && w >= 1 && h >= 1)
      // no upscaling
      assert(w <= m.getInt(0) && h <= m.getInt(1))
    }
  }

  test("frame sampling slices n windows of the payload") {
    val frames = media.select(Multimodal.frameSample($"payload", 4, 16).as("fr"))
      .collect()
    frames.foreach { r =>
      val fs = r.getSeq[Array[Byte]](0)
      assert(fs.length == 4)
      fs.foreach(f => assert(f.length == 16))
    }
  }

  test("decodeImages decodes a real embedded PNG fixture via javax.imageio") {
    // a genuine 1x1 PNG file (the smallest well-known valid PNG), plus a
    // generated 32x16 gradient PNG, plus junk bytes and a non-image row
    val onePixelPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    val img = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, (x * 8 << 16) | (y * 16 << 8) | 128)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val gradientPng = baos.toByteArray

    val rows = Seq(
      (1L, "image", onePixelPng),
      (2L, "image", gradientPng),
      (3L, "image", Array.tabulate(64)(_.toByte)), // junk → null decode
      (4L, "audio", gradientPng))                  // wrong media_type → skipped
      .toDF("media_id", "media_type", "payload")

    val out = Multimodal.decodeImages(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Int]("img_width") == 1)
    assert(out(1L).getAs[Int]("img_height") == 1)
    assert(out(1L).getSeq[Double](out(1L).fieldIndex("img_luma")).length == 1)
    assert(out(2L).getAs[Int]("img_width") == 32)
    assert(out(2L).getAs[Int]("img_height") == 16)
    val luma = out(2L).getSeq[Double](out(2L).fieldIndex("img_luma"))
    assert(luma.length == 64) // 8x8 grid
    assert(luma.forall(v => v >= 0.0 && v <= 1.0))
    // the gradient brightens left-to-right: first grid column darker than last
    assert(luma(0) < luma(7))
    assert(out(3L).isNullAt(out(3L).fieldIndex("img_width")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("img_width")))
  }

  test("decodeAudio decodes a real WAV fixture via javax.sound.sampled") {
    // 0.1 s of a 440 Hz half-amplitude sine at 8 kHz mono 16-bit PCM —
    // built by syntheticWav (a genuine RIFF/WAVE file), plus junk bytes
    // and a non-audio row
    val tone = Multimodal.syntheticWav(
      nSamples = 800, sampleRate = 8000, freqHz = 440.0, amplitude = 0.5)
    // round-trip check: the JDK itself recognizes the synthesized header
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(tone))
    assert(fmt.getType == javax.sound.sampled.AudioFileFormat.Type.WAVE)

    val rows = Seq(
      (1L, "audio", tone),
      (2L, "audio", Array.tabulate(64)(_.toByte)), // junk → null decode
      (3L, "image", tone))                         // wrong media_type → skipped
      .toDF("media_id", "media_type", "payload")
    val out = Multimodal.decodeAudio(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Int]("audio_sample_rate") == 8000)
    assert(out(1L).getAs[Int]("audio_channels") == 1)
    assert(out(1L).getAs[Long]("audio_duration_ms") == 100L)
    // sine RMS = A/√2; 16-bit quantization keeps it within ~1%
    val rms = out(1L).getAs[Double]("audio_rms")
    assert(math.abs(rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms $rms")
    assert(out(2L).isNullAt(out(2L).fieldIndex("audio_sample_rate")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("audio_sample_rate")))
  }

  test("decodeVideo parses real MP4 and AVI container headers") {
    // 640×360, 12.345 s at timescale 1000 — a genuine ISO-BMFF box tree
    val mp4 = Multimodal.syntheticMp4(
      width = 640, height = 360, timescale = 1000, duration = 12345)
    // 320×240, 250 frames at 25 fps (40 ms/frame) → 10 s
    val avi = Multimodal.syntheticAvi(
      width = 320, height = 240, usPerFrame = 40000, totalFrames = 250)
    val rows = Seq(
      (1L, "video", mp4),
      (2L, "video", avi),
      (3L, "video", Array.tabulate(64)(_.toByte)),   // junk → null decode
      (4L, "video", mp4.take(20)),                   // truncated → null decode
      (5L, "image", mp4))                            // wrong media_type → skipped
      .toDF("media_id", "media_type", "payload")
    val out = Multimodal.decodeVideo(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Int]("video_width") == 640)
    assert(out(1L).getAs[Int]("video_height") == 360)
    assert(out(1L).getAs[Long]("video_duration_ms") == 12345L)
    assert(out(1L).getAs[String]("video_codec") == "avc1")
    assert(out(2L).getAs[Int]("video_width") == 320)
    assert(out(2L).getAs[Int]("video_height") == 240)
    assert(out(2L).getAs[Long]("video_duration_ms") == 10000L)
    assert(out(2L).getAs[String]("video_codec") == "MJPG")
    assert(out(3L).isNullAt(out(3L).fieldIndex("video_width")))
    assert(out(4L).isNullAt(out(4L).fieldIndex("video_width")))
    assert(out(5L).isNullAt(out(5L).fieldIndex("video_width")))
  }

  test("decodeVideo handles 64-bit largesize boxes and v1 headers") {
    // rewrite the fixture's moov as a largesize box: size=1 + 64-bit size
    val mp4 = Multimodal.syntheticMp4(
      width = 1920, height = 1080, timescale = 90000, duration = 900000)
    val moovStart = {
      // ftyp is 20 bytes in the fixture; moov follows
      val ftypLen = java.nio.ByteBuffer.wrap(mp4, 0, 4).getInt
      ftypLen
    }
    val moovLen = java.nio.ByteBuffer.wrap(mp4, moovStart, 4).getInt
    val rewritten = java.nio.ByteBuffer.allocate(mp4.length + 8)
    rewritten.put(mp4, 0, moovStart)
    rewritten.putInt(1).put("moov".getBytes("ISO-8859-1"))
      .putLong(moovLen.toLong + 8)
    rewritten.put(mp4, moovStart + 8, mp4.length - moovStart - 8)
    val out = Multimodal.decodeVideo(
        Seq((1L, "video", rewritten.array())).toDF("media_id", "media_type", "payload"))
      .collect().head
    assert(out.getAs[Int]("video_width") == 1920)
    assert(out.getAs[Int]("video_height") == 1080)
    assert(out.getAs[Long]("video_duration_ms") == 10000L)
    assert(out.getAs[String]("video_codec") == "avc1")
  }

  test("decodeVideo skips a leading zero-dim (audio) trak — real files order traks that way") {
    // splice two fixtures into one moov: trak A has 0×0 dims (the shape an
    // audio trak presents in tkhd), trak B is the video trak
    def parts(mp4: Array[Byte]): (Array[Byte], Array[Byte], Array[Byte]) = {
      val ftypLen = java.nio.ByteBuffer.wrap(mp4, 0, 4).getInt
      val mvhdStart = ftypLen + 8
      val mvhdLen = java.nio.ByteBuffer.wrap(mp4, mvhdStart, 4).getInt
      val trakStart = mvhdStart + mvhdLen
      val trakLen = java.nio.ByteBuffer.wrap(mp4, trakStart, 4).getInt
      (java.util.Arrays.copyOfRange(mp4, 0, ftypLen),                  // ftyp
        java.util.Arrays.copyOfRange(mp4, mvhdStart, mvhdStart + mvhdLen),
        java.util.Arrays.copyOfRange(mp4, trakStart, trakStart + trakLen))
    }
    val (_, _, audioTrak) = parts(Multimodal.syntheticMp4(0, 0, 1000, 5000, "mp4a"))
    val (ftyp, mvhd, videoTrak) = parts(
      Multimodal.syntheticMp4(640, 360, 1000, 12345, "avc1"))
    val moovPayload = mvhd ++ audioTrak ++ videoTrak
    val moov = java.nio.ByteBuffer.allocate(8 + moovPayload.length)
      .putInt(8 + moovPayload.length).put("moov".getBytes("ISO-8859-1"))
      .put(moovPayload).array()
    val spliced = ftyp ++ moov
    val out = Multimodal.decodeVideo(
        Seq((1L, "video", spliced)).toDF("media_id", "media_type", "payload"))
      .collect().head
    assert(out.getAs[Int]("video_width") == 640)
    assert(out.getAs[Int]("video_height") == 360)
    assert(out.getAs[Long]("video_duration_ms") == 12345L)
    assert(out.getAs[String]("video_codec") == "avc1") // not the audio mp4a
  }

  test("batched processing preserves rows and appends columns") {
    val out = Multimodal.processBatches(media, batchSize = 3,
      StructType(Seq(StructField("n_bytes", IntegerType)))) { batch =>
      batch.map(r => Seq(r.getAs[Array[Byte]]("payload").length))
    }
    val rows = out.collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Int]("n_bytes") == 256))
  }

  test("mjpegFrames extracts decodable JPEG chunks; header-only AVI has none") {
    val frames = Seq(0xFF0000, 0x00FF00, 0x0000FF)
      .map(Multimodal.syntheticJpeg(32, 24, _))
    val avi = Multimodal.syntheticAvi(32, 24, usPerFrame = 40000,
      totalFrames = 3, frames = frames)
    val got = Multimodal.mjpegFrames(avi)
    assert(got.length == 3)
    got.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 32 && img.getHeight == 24)
    }
    // the pre-round-7 header-only container is byte-compatible (x37 oracle)
    assert(Multimodal.mjpegFrames(
      Multimodal.syntheticAvi(32, 24, 40000, 3)).isEmpty)
    assert(Multimodal.mjpegFrames(null).isEmpty)
    assert(Multimodal.mjpegFrames("not an avi".getBytes).isEmpty)
  }

  test("mjpegFrames: hostile chunk size near Int.MaxValue stops the walk, no throw") {
    def le32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    // top-level chunk whose size wraps dataS+size negative
    val topLevel = cc("RIFF") ++ le32(64) ++ cc("AVI ") ++
      cc("00dc") ++ le32(0x7FFFFFF0) ++ Array.fill[Byte](16)(0)
    assert(Multimodal.mjpegFrames(topLevel).isEmpty)
    // same wrap INSIDE a movi LIST, where the copyOfRange would throw
    val inner = cc("00dc") ++ le32(0x7FFFFFF0) ++ Array.fill[Byte](8)(0)
    val moviPayload = cc("movi") ++ inner
    val inMovi = cc("RIFF") ++ le32(4 + 8 + moviPayload.length) ++ cc("AVI ") ++
      cc("LIST") ++ le32(moviPayload.length) ++ moviPayload
    assert(Multimodal.mjpegFrames(inMovi).isEmpty)
  }

  test("sampleVideoFrames: frame table with real pixel luma, every-Nth sampling") {
    // near-black and near-white frames: JPEG is lossy but a solid frame
    // roundtrips within a couple of 8-bit steps — luma must separate them
    val frames = Seq(0x000000, 0xFFFFFF, 0x000000, 0xFFFFFF)
      .map(Multimodal.syntheticJpeg(64, 48, _))
    val avi = Multimodal.syntheticAvi(64, 48, 40000, 4, frames = frames)
    val df = Seq(
      (1L, "video", avi),
      (2L, "image", avi), // wrong type: no frame rows
      (3L, "video", Array[Byte](1, 2, 3)) // junk: no frame rows
    ).toDF("media_id", "media_type", "payload")
    val out = Multimodal.sampleVideoFrames(df, every = 2)
      .orderBy($"media_id", $"frame_idx").collect()
    assert(out.map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx")))
      .toSeq == Seq((1L, 0), (1L, 2)))
    out.foreach { r =>
      assert(r.getAs[Int]("frame_width") == 64)
      assert(r.getAs[Int]("frame_height") == 48)
    }
    assert(out(0).getAs[Double]("frame_mean_luma") < 0.05) // black frame 0
    assert(out(1).getAs[Double]("frame_mean_luma") < 0.05) // black frame 2
    val all = Multimodal.sampleVideoFrames(df, every = 1)
      .orderBy($"media_id", $"frame_idx").collect()
    assert(all.length == 4)
    assert(all(1).getAs[Double]("frame_mean_luma") > 0.95) // white frame 1
    // payload column is consumed, not carried into the frame table
    assert(!all.head.schema.fieldNames.contains("payload"))
  }

  test("resizeImages: exact nearest-neighbor means on lossless PNG; no upscale") {
    val gradient = Multimodal.syntheticPng(8, 6,
      (x, y) => ((30 * x) << 16) | ((40 * y) << 8) | 10)
    val tiny = Multimodal.syntheticPng(2, 2,
      (x, y) => ((100 + x) << 16) | ((50 + y) << 8) | (x + 2 * y))
    val df = Seq(
      (1L, "image", gradient), (2L, "image", tiny),
      (3L, "image", Array[Byte](9)), (4L, "audio", gradient))
      .toDF("media_id", "media_type", "payload")
    val out = Multimodal.resizeImages(df, maxW = 4, maxH = 3)
      .orderBy($"media_id").collect()
    val g = out(0)
    assert(g.getAs[Int]("resized_width") == 4 && g.getAs[Int]("resized_height") == 3)
    assert(g.getAs[scala.collection.Seq[Double]]("resized_mean_rgb") == Seq(90.0, 80.0, 10.0))
    val t = out(1) // 2×2 into a 4×3 box: never upscaled
    assert(t.getAs[Int]("resized_width") == 2 && t.getAs[Int]("resized_height") == 2)
    assert(t.getAs[scala.collection.Seq[Double]]("resized_mean_rgb") == Seq(100.5, 50.5, 1.5))
    assert(out(2).isNullAt(out(2).fieldIndex("resized_width"))) // undecodable
    assert(out(3).isNullAt(out(3).fieldIndex("resized_width"))) // non-image
  }

  test("resizeImages: ceil rounding never busts the target box") {
    // 25 wide into maxW=7: (7/25)*25 = 7.0000000000000005, ceil → 8
    // without the clamp — the output must stay inside the box
    val wide = Multimodal.syntheticPng(25, 10, (x, y) => (x << 16) | (y << 8))
    val df = Seq((1L, "image", wide)).toDF("media_id", "media_type", "payload")
    val r = Multimodal.resizeImages(df, maxW = 7, maxH = 10).collect().head
    assert(r.getAs[Int]("resized_width") == 7)
    assert(r.getAs[Int]("resized_height") == 3) // ceil(10 * 0.28) — aspect kept
  }
}
