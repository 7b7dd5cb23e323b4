package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata (north-star extension — the reference is text-only).
  *
  * Codec status, honestly per modality:
  *  - **image: REAL.** The JDK ships PNG/JPEG/BMP/GIF codecs
  *    (`javax.imageio`), so decode, luminance features, and aspect-
  *    preserving resize run on actual pixels with zero extra deps.
  *  - **audio: REAL** for WAV/PCM (`javax.sound.sampled`): header parse,
  *    16-bit PCM decode, RMS/zero-crossing/amplitude-histogram features.
  *  - **video: REAL at the CONTAINER level** (MP4/ISO-BMFF box walk,
  *    pure byte parsing, zero deps): presentation dims from tkhd,
  *    duration/timescale from mvhd, track count — the metadata gates a
  *    100 TB ingest filter actually runs. FRAME-level decode (H.264 et
  *    al.) needs codecs the JDK doesn't ship and is formally out of
  *    scope; payload features beyond the container walk are the labeled
  *    byte-histogram stand-in.
  * Undecodable bytes of any modality fall back to the stub path instead
  * of failing the partition — corrupt media is data, not an exception.
  *
  * The operator shape is the production-real part: per-partition batched
  * `mapPartitions` over a typed Dataset (codec init amortizes once per
  * partition), deterministic output schema, features as `array<float>`.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, data: Array[Byte], meta: Map[String, String])

  /** width/height are pixels for images, (sampleRate, frames) for audio,
    * container presentation dims for video, stub pseudo-dims for
    * undecodable bytes; `decoded` marks whether the REAL codec/container
    * path produced the row. */
  case class DecodedRow(
      media_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, decoded: Boolean, features: Array[Float])

  // --- real image codec (JDK ImageIO) ------------------------------------

  /** Deterministic synthetic RGB PNG (test/media generator). */
  def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodeImage(data: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(data)))
    catch { case _: Exception => None }

  /** 16-bin luminance histogram over the real pixels, L1-normalized. */
  def imageFeatures(img: BufferedImage): Array[Float] = {
    val hist = new Array[Float](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        hist(lum * 16 / 256) += 1f
        x += 1
      }
      y += 1
    }
    val total = hist.sum
    if (total > 0) { var j = 0; while (j < 16) { hist(j) /= total; j += 1 } }
    hist
  }

  /** REAL aspect-preserving resize: decode, scale through Graphics2D,
    * re-encode PNG. None when the bytes don't decode; unchanged bytes when
    * already within `maxSide`. */
  def resizeImage(data: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    decodeImage(data).map { img =>
      val scale = math.min(maxSide.toDouble / math.max(img.getWidth, img.getHeight), 1.0)
      if (scale >= 1.0) data
      else {
        val tw = math.max(1, math.ceil(img.getWidth * scale).toInt)
        val th = math.max(1, math.ceil(img.getHeight * scale).toInt)
        val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img.getScaledInstance(tw, th, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
        finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }

  // --- real audio codec (JDK javax.sound, WAV/PCM) ------------------------

  /** Deterministic 16-bit PCM WAV of a sine tone (test/media gen). */
  def encodeWav(nFrames: Int, sampleRate: Float, freqHz: Double, channels: Int = 1): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2 * channels)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toShort
      var c = 0
      while (c < channels) {
        val base = 2 * (i * channels + c)
        pcm(base) = (s & 0xff).toByte
        pcm(base + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** WAV decode: (sampleRate, frames, 16-dim features = [rms,
    * zero-crossing-rate, 14-bin amplitude histogram]). Multi-channel PCM
    * is handled by averaging channels per FRAME (frame count and
    * zero-crossings are computed on the mixed-down waveform, never on
    * interleaved samples). None if the bytes aren't parseable 16-bit
    * PCM. */
  def audioFeatures(data: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(data))
      try {
        val fmt = ais.getFormat
        val channels = fmt.getChannels
        if (fmt.getSampleSizeInBits != 16 || channels < 1) None
        else {
          val bytes = ais.readAllBytes()
          val nFrames = bytes.length / (2 * channels)
          var sumSq = 0.0
          var crossings = 0
          var prevPositive = true
          val hist = new Array[Float](14)
          var f = 0
          while (f < nFrames) {
            // mix channels down to one sample per frame
            var acc = 0
            var c = 0
            while (c < channels) {
              val base = 2 * (f * channels + c)
              val lo = bytes(base) & 0xff
              val s =
                if (fmt.isBigEndian) ((lo << 8) | (bytes(base + 1) & 0xff)).toShort
                else ((bytes(base + 1).toInt << 8) | lo).toShort
              acc += s
              c += 1
            }
            val s = acc / channels
            sumSq += s.toDouble * s
            val positive = s >= 0
            if (f > 0 && positive != prevPositive) crossings += 1
            prevPositive = positive
            hist(math.min(math.abs(s) * 14 / 32768, 13)) += 1f
            f += 1
          }
          val total = hist.sum
          if (total > 0) { var j = 0; while (j < 14) { hist(j) /= total; j += 1 } }
          val feats = new Array[Float](16)
          feats(0) = if (nFrames > 0) (math.sqrt(sumSq / nFrames) / 32768.0).toFloat else 0f
          feats(1) = if (nFrames > 1) crossings.toFloat / (nFrames - 1) else 0f
          System.arraycopy(hist, 0, feats, 2, 14)
          Some((fmt.getSampleRate.toInt, nFrames, feats))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  // --- real video container metadata (MP4/ISO-BMFF box parse, pure JVM) ---

  /** Container-level video metadata: presentation dims (tkhd 16.16 fixed),
    * movie timescale/duration (mvhd), track count. */
  case class Mp4Meta(width: Int, height: Int, timescale: Long, durationTicks: Long, tracks: Int) {
    def durationSeconds: Double = if (timescale > 0) durationTicks.toDouble / timescale else 0.0
  }

  private def be32(d: Array[Byte], p: Int): Long =
    ((d(p) & 0xffL) << 24) | ((d(p + 1) & 0xffL) << 16) | ((d(p + 2) & 0xffL) << 8) | (d(p + 3) & 0xffL)
  private def be64(d: Array[Byte], p: Int): Long =
    (be32(d, p) << 32) | be32(d, p + 4)
  private def boxType(d: Array[Byte], p: Int): String =
    new String(d, p + 4, 4, "US-ASCII")

  /** Walk one ISO-BMFF box level in [lo, hi): returns (type, contentFrom,
    * contentEnd) tuples. Malformed sizes end the walk. */
  private def boxes(d: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = lo
      def hasNext: Boolean = pos + 8 <= hi
      def next(): (String, Int, Int) = {
        val size0 = be32(d, pos)
        val t = boxType(d, pos)
        val (contentFrom, size) =
          if (size0 == 1 && pos + 16 <= hi) (pos + 16, be64(d, pos + 8))
          else if (size0 == 0) (pos + 8, (hi - pos).toLong)
          else (pos + 8, size0)
        val end =
          if (size < 8 || pos + size > hi || pos + size < 0) hi // malformed: stop after this
          else pos + size.toInt
        val out = (t, contentFrom, end)
        pos = if (end <= pos) hi else end
        out
      }
    }

  private val TopLevelBrands =
    Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "pdin", "sidx", "moof", "mfra", "meta", "uuid")

  /** MP4/ISO-BMFF container metadata parse — REAL (byte-level box walk,
    * zero deps): mvhd → timescale/duration, first video-sized tkhd →
    * width/height, trak count. None for anything that isn't a plausible
    * ISO-BMFF stream (first box must be a known top-level type), so raw
    * text/corrupt bytes take the stub fallback. FRAME-level decode (H.264
    * et al.) needs codecs the JDK doesn't ship and stays out of scope —
    * the container walk is what a 100 TB ingest filter actually runs
    * (dims/duration gates before any expensive transcode). */
  def mp4Metadata(data: Array[Byte]): Option[Mp4Meta] =
    try {
      if (data.length < 16 || !TopLevelBrands.contains(boxType(data, 0))) None
      else {
        var timescale = 0L; var duration = 0L
        var w = 0; var h = 0; var tracks = 0
        boxes(data, 0, data.length).foreach {
          case ("moov", cFrom, cTo) =>
            boxes(data, cFrom, cTo).foreach {
              case ("mvhd", mFrom, mTo) if mFrom + 20 <= mTo =>
                val version = data(mFrom) & 0xff
                if (version == 1 && mFrom + 28 <= mTo) {
                  timescale = be32(data, mFrom + 20)
                  duration = be64(data, mFrom + 24)
                } else {
                  timescale = be32(data, mFrom + 12)
                  duration = be32(data, mFrom + 16)
                }
              case ("trak", tFrom, tTo) =>
                tracks += 1
                boxes(data, tFrom, tTo).foreach {
                  case ("tkhd", kFrom, kTo) if kFrom + 84 <= kTo =>
                    // width/height are the LAST 8 bytes of tkhd (16.16
                    // fixed) in BOTH tkhd versions (end-anchored, so the
                    // v0/v1 time-field width difference doesn't matter);
                    // first video-sized track wins
                    val wd = (be32(data, kTo - 8) >> 16).toInt
                    val ht = (be32(data, kTo - 4) >> 16).toInt
                    if (w == 0 && wd > 0 && ht > 0) { w = wd; h = ht }
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
        if (timescale > 0) Some(Mp4Meta(w, h, timescale, duration, tracks)) else None
      }
    } catch { case _: Exception => None }

  /** Deterministic minimal-but-VALID MP4 skeleton (ftyp + moov[mvhd +
    * trak[tkhd]]) — the media generator for video rows, the container
    * analog of [[encodePng]]/[[encodeWav]]. */
  def encodeMp4(width: Int, height: Int, durationTicks: Long, timescale: Long = 1000L): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def i32(v: Long): Unit = { bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt) }
    def tag(t: String): Unit = bos.write(t.getBytes("US-ASCII"))
    // ftyp
    i32(24); tag("ftyp"); tag("isom"); i32(512); tag("isom"); tag("mp41")
    // moov = 8 + mvhd(108) + trak(100)
    i32(8 + 108 + 100); tag("moov")
    // mvhd v0
    i32(108); tag("mvhd"); i32(0) // version+flags
    i32(0); i32(0) // ctime mtime
    i32(timescale); i32(durationTicks)
    i32(0x00010000) // rate 1.0
    bos.write(Array[Byte](0x01, 0x00)) // volume 1.0
    (0 until 10).foreach(_ => bos.write(0)) // reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(i32) // identity matrix
    (0 until 6).foreach(_ => i32(0)) // pre_defined
    i32(2) // next track id
    // trak > tkhd v0
    i32(100); tag("trak")
    i32(92); tag("tkhd"); i32(7) // version 0, flags: enabled|in-movie
    i32(0); i32(0) // ctime mtime
    i32(1) // track id
    i32(0) // reserved
    i32(durationTicks)
    i32(0); i32(0) // reserved
    bos.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)) // layer, alt_group, volume, reserved
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L).foreach(i32)
    i32(width.toLong << 16); i32(height.toLong << 16) // 16.16 fixed
    bos.toByteArray
  }

  /** Video features from REAL container metadata: [durationSec, tracks,
    * aspect, bytes/sec] + a 12-bin byte histogram of the stream (stride 4,
    * the frame-sample stand-in for payload stats). 16-dim like the other
    * modalities. */
  def videoFeatures(data: Array[Byte], meta: Mp4Meta): Array[Float] = {
    val feats = new Array[Float](16)
    feats(0) = meta.durationSeconds.toFloat
    feats(1) = meta.tracks.toFloat
    feats(2) = if (meta.height > 0) meta.width.toFloat / meta.height else 0f
    feats(3) = if (meta.durationSeconds > 0) (data.length / meta.durationSeconds).toFloat else 0f
    val hist = new Array[Float](12)
    var i = 0
    while (i < data.length) { hist((data(i) & 0xff) % 12) += 1f; i += 4 }
    val total = hist.sum
    if (total > 0) { var j = 0; while (j < 12) { hist(j) /= total; j += 1 } }
    System.arraycopy(hist, 0, feats, 4, 12)
    feats
  }

  // --- stub fallback (undecodable bytes of any modality) -------------------

  /** STUB codec (video / fallback): deterministic pseudo-dimensions from
    * the byte content so downstream plumbing stays testable. */
  def stubDecode(data: Array[Byte]): (Int, Int) = {
    val h = java.util.Arrays.hashCode(data)
    (math.floorMod(h, 1920) + 1, math.floorMod(h >>> 16, 1080) + 1)
  }

  /** STUB feature extractor: 16-dim byte-histogram. Per-frame sampling for
    * "video" = byte-stride subsampling, mirroring frame-sample semantics. */
  def stubFeatures(data: Array[Byte], modality: String): Array[Float] = {
    val stride = if (modality == "video") 4 else 1 // frame-sample stand-in
    val hist = new Array[Float](16)
    var i = 0
    while (i < data.length) { hist((data(i) & 0xff) % 16) += 1f; i += stride }
    val total = hist.sum
    if (total > 0) { var j = 0; while (j < 16) { hist(j) /= total; j += 1 } }
    hist
  }

  // --- media generation + the operator ------------------------------------

  /** Binary "media" table from a text fixture: image rows carry REAL PNG
    * bytes, audio rows REAL WAV bytes, video rows REAL MP4 container
    * bytes (all deterministic from the id). Every third video row keeps
    * the raw UTF-8 text instead — a permanently-corrupt slice exercising
    * the stub fallback the way real crawl media does. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("data"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[MediaRow]
      .map { r =>
        r.modality match {
          case "image" => r.copy(data = encodePng(32 + (r.media_id % 32).toInt, 24 + (r.media_id % 24).toInt, r.media_id))
          case "audio" => r.copy(data = encodeWav(800 + (r.media_id % 400).toInt, 8000f, 440.0 + (r.media_id % 200)))
          case "video" if r.media_id % 9 != 2 =>
            r.copy(data = encodeMp4(
              320 + (r.media_id % 1600).toInt, 240 + (r.media_id % 840).toInt,
              durationTicks = 1000 + (r.media_id % 120000)))
          case _ => r // corrupt-video slice: raw text bytes → stub fallback
        }
      }
  }

  /** The decode/feature-extract operator: per-partition batched so codec
    * init happens once per partition (not per row). Image and audio run
    * the REAL JDK codecs; video (and any undecodable bytes) take the
    * labeled stub fallback. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // codec/session init would happen here, once per partition
      rows.map { r =>
        def fallback = {
          val (w, h) = stubDecode(r.data)
          DecodedRow(r.media_id, r.modality, r.data.length, w, h, decoded = false, stubFeatures(r.data, r.modality))
        }
        r.modality match {
          case "image" => decodeImage(r.data) match {
            case Some(img) =>
              DecodedRow(r.media_id, r.modality, r.data.length,
                img.getWidth, img.getHeight, decoded = true, imageFeatures(img))
            case None => fallback
          }
          case "audio" => audioFeatures(r.data) match {
            case Some((rate, frames, feats)) =>
              DecodedRow(r.media_id, r.modality, r.data.length, rate, frames, decoded = true, feats)
            case None => fallback
          }
          case "video" => mp4Metadata(r.data) match {
            case Some(meta) =>
              DecodedRow(r.media_id, r.modality, r.data.length,
                meta.width, meta.height, decoded = true, videoFeatures(r.data, meta))
            case None => fallback
          }
          case _ => fallback
        }
      }
    }
  }

  /** Resize planning over decoded dims: target size preserving aspect
    * ratio (the per-image pixel work is [[resizeImage]]). */
  def resizePlan(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame =
    decoded.toDF().select(
      col("media_id"), col("modality"), col("width"), col("height"), col("decoded"),
      least(lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0)).as("scale"))
      .withColumn("target_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", ceil(col("height") * col("scale")).cast("int"))
}
