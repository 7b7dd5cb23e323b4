package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the Spark-side contract (schema, typed Dataset,
  * per-partition batch shape, deterministic outputs) is real; codecs are
  * marked stubs. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "first document text here", "en", "srcA", 24L),
    (1L, "second one", "de", "srcB", 10L),
    (2L, "third payload somewhat longer than the rest", "fr", "srcC", 43L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("syntheticMedia: binary data round-trips, modality cycles, metadata typed") {
    val media = Multimodal.syntheticMedia(spark, docs).collect().sortBy(_.media_id)
    assert(media.map(_.modality).toSeq == Seq("image", "audio", "video"))
    assert(new String(media(0).data, "UTF-8") == "first document text here")
    assert(media(1).meta == Map("source" -> "srcB", "lang" -> "de"))
  }

  test("decodeAndFeaturize: deterministic, 16-dim normalized features, video strides") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val out1 = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val out2 = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    assert(out1.map(_.features.toSeq).toSeq == out2.map(_.features.toSeq).toSeq) // deterministic
    out1.foreach { r =>
      assert(r.features.length == 16)
      assert(math.abs(r.features.sum - 1.0f) < 1e-3 || r.features.sum == 0f) // normalized histogram
      assert(r.width >= 1 && r.width <= 1920 && r.height >= 1 && r.height <= 1080)
    }
    // frame-sample stride: the video row consumed every 4th byte
    val video = out1.find(_.modality == "video").get
    assert(video.n_bytes == 43)
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
