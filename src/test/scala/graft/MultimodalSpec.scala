package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: image and audio run REAL JDK codecs (ImageIO,
  * javax.sound WAV/PCM); video runs a REAL MP4/ISO-BMFF container-metadata
  * parse (frame-level decode is formally out of scope — no JDK codec);
  * undecodable bytes of any modality take the labeled stub fallback; the
  * Spark-side contract (schema, typed Dataset, per-partition batch shape,
  * deterministic outputs) is real throughout. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "first document text here", "en", "srcA", 24L),
    (1L, "second one", "de", "srcB", 10L),
    (2L, "third payload somewhat longer than the rest", "fr", "srcC", 43L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("syntheticMedia: modality cycles; image/audio carry real codec bytes; doc 2 is the corrupt-video slice") {
    val media = Multimodal.syntheticMedia(spark, docs).collect().sortBy(_.media_id)
    assert(media.map(_.modality).toSeq == Seq("image", "audio", "video"))
    // image bytes are a real PNG (magic header), audio a real WAV (RIFF)
    assert(media(0).data.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(new String(media(1).data.take(4), "US-ASCII") == "RIFF")
    // media_id % 9 == 2: the permanently-corrupt slice keeps raw text
    assert(new String(media(2).data, "UTF-8") == "third payload somewhat longer than the rest")
    assert(media(1).meta == Map("source" -> "srcB", "lang" -> "de"))
  }

  test("real video container path: MP4 metadata round-trips dims/duration; corrupt bytes -> None") {
    val mp4 = Multimodal.encodeMp4(640, 360, durationTicks = 90000, timescale = 1000)
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    val meta = Multimodal.mp4Metadata(mp4)
    assert(meta.contains(Multimodal.Mp4Meta(640, 360, 1000, 90000, 1)))
    assert(math.abs(meta.get.durationSeconds - 90.0) < 1e-9)
    assert(Multimodal.mp4Metadata("definitely not an mp4 container".getBytes).isEmpty)
    assert(Multimodal.mp4Metadata(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("decodeAndFeaturize: a valid-MP4 video row decodes to container dims") {
    val vdocs = Seq((5L, "video payload five", "en", "srcV", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars") // 5 % 3 == 2 -> video, 5 % 9 != 2 -> real MP4
    val out = Multimodal.decodeAndFeaturize(Multimodal.syntheticMedia(spark, vdocs)).collect()
    assert(out.length == 1)
    val v = out.head
    assert(v.modality == "video" && v.decoded)
    assert(v.width == 320 + 5 && v.height == 240 + 5)
    assert(v.features.length == 16)
    assert(math.abs(v.features(0) - (1000 + 5) / 1000.0) < 1e-6) // durationSec from mvhd
    assert(v.features(1) == 1f) // track count
  }

  test("real image path: PNG decodes to its true dimensions with pixel-histogram features") {
    val png = Multimodal.encodePng(64, 48, seed = 7L)
    val img = Multimodal.decodeImage(png)
    assert(img.isDefined && img.get.getWidth == 64 && img.get.getHeight == 48)
    val feats = Multimodal.imageFeatures(img.get)
    assert(feats.length == 16 && math.abs(feats.sum - 1.0f) < 1e-3)
    // corrupt bytes decode to None, not an exception
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("real resize: re-encoded image honors maxSide and aspect ratio; small images pass through") {
    val png = Multimodal.encodePng(64, 48, seed = 7L)
    val resized = Multimodal.resizeImage(png, maxSide = 32).get
    val back = Multimodal.decodeImage(resized).get
    assert(back.getWidth == 32 && back.getHeight == 24) // aspect 4:3 preserved
    assert(Multimodal.resizeImage(png, maxSide = 128).get eq png) // within bounds: untouched bytes
    assert(Multimodal.resizeImage("junk".getBytes, 32).isEmpty)
  }

  test("real audio path: WAV round-trips sample rate and frames; sine has energy + crossings") {
    val wav = Multimodal.encodeWav(nFrames = 1600, sampleRate = 8000f, freqHz = 440.0)
    val Some((rate, frames, feats)) = Multimodal.audioFeatures(wav)
    assert(rate == 8000 && frames == 1600)
    assert(feats.length == 16)
    assert(feats(0) > 0.1f, s"sine RMS should be substantial, got ${feats(0)}") // rms of 12000/32768 amplitude
    assert(feats(1) > 0.05f, "440 Hz at 8 kHz must cross zero often")
    assert(Multimodal.audioFeatures("definitely not audio".getBytes).isEmpty)
  }

  test("stereo WAV: frames count true frames (not interleaved samples), features sane") {
    val stereo = Multimodal.encodeWav(nFrames = 1600, sampleRate = 8000f, freqHz = 440.0, channels = 2)
    val Some((rate, frames, feats)) = Multimodal.audioFeatures(stereo)
    assert(rate == 8000 && frames == 1600, s"stereo frame count wrong: $frames")
    assert(feats(0) > 0.1f && feats(1) > 0.05f) // mixed-down waveform, not L/R interleave
  }

  test("decodeAndFeaturize: real paths flagged decoded=true, corrupt video falls back to stub") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val out1 = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val out2 = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    assert(out1.map(_.features.toSeq).toSeq == out2.map(_.features.toSeq).toSeq) // deterministic
    val img = out1.find(_.modality == "image").get
    assert(img.decoded && img.width == 32 && img.height == 24) // 32+0%32, 24+0%24
    val audio = out1.find(_.modality == "audio").get
    assert(audio.decoded && audio.width == 8000 && audio.height == 800 + 1 % 400)
    val video = out1.find(_.modality == "video").get
    assert(!video.decoded && video.n_bytes == 43)
    out1.foreach { r =>
      assert(r.features.length == 16)
      assert(math.abs(r.features.sum - 1.0f) < 1e-3 || r.modality == "audio" || r.features.sum == 0f)
    }
  }

  test("resizePlan: aspect ratio preserved, never upscales") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val plan = Multimodal.resizePlan(Multimodal.decodeAndFeaturize(media), maxSide = 256).collect()
    plan.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))
      assert(math.max(tw, th) <= 256 || (w <= 256 && h <= 256))
      assert(tw <= w && th <= h) // scale <= 1: no upscaling
    }
  }
}
