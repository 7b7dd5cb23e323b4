package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata (north-star extension — the reference is text-only).
  *
  * The Spark-side contract is fully real — schema, partition-preserving
  * batch iteration via `mapPartitions` over a typed Dataset, deterministic
  * output shape — while the codec step is a clearly-marked STUB (no
  * image/audio libraries exist in this container). Swapping
  * [[stubDecode]] / [[stubFeatures]] for a JNI/av codec is a local change:
  * the operator shape (per-partition batched decode to amortize codec
  * init, feature vectors as `array<float>`) is what matters at 100 TB.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, data: Array[Byte], meta: Map[String, String])
  case class DecodedRow(
      media_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** Wrap a text fixture into a binary "media" table (test stand-in: bytes
    * are the UTF-8 text; modality round-robins image/audio/video). */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("data"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[MediaRow]
  }

  /** STUB codec: a real implementation would decode image bytes (JPEG/PNG)
    * to pixels here. The stub derives deterministic pseudo-dimensions from
    * the byte content so downstream plumbing is testable. */
  def stubDecode(data: Array[Byte]): (Int, Int) = {
    val h = java.util.Arrays.hashCode(data)
    (math.floorMod(h, 1920) + 1, math.floorMod(h >>> 16, 1080) + 1)
  }

  /** STUB feature extractor: 16-dim byte-histogram features (deterministic
    * fake for an image/audio encoder). Per-frame sampling for "video" =
    * byte-stride subsampling, mirroring real frame-sample semantics. */
  def stubFeatures(data: Array[Byte], modality: String): Array[Float] = {
    val stride = if (modality == "video") 4 else 1 // frame-sample stand-in
    val hist = new Array[Float](16)
    var i = 0
    while (i < data.length) { hist((data(i) & 0xff) % 16) += 1f; i += stride }
    val total = hist.sum
    if (total > 0) { var j = 0; while (j < 16) { hist(j) /= total; j += 1 } }
    hist
  }

  /** The decode/feature-extract operator: per-partition batched so a real
    * codec would init once per partition (not per row). Partitioning,
    * schema, and batch shape are production-real; only the codec is fake. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // codec/session init would happen here, once per partition
      rows.map { r =>
        val (w, h) = stubDecode(r.data)
        DecodedRow(r.media_id, r.modality, r.data.length, w, h, stubFeatures(r.data, r.modality))
      }
    }
  }

  /** Resize metadata transform (STUB): computes target dims preserving
    * aspect ratio — the pixel work is the codec's, the plumbing is ours. */
  def resizePlan(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame =
    decoded.toDF().select(
      col("media_id"), col("modality"), col("width"), col("height"),
      least(lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0)).as("scale"))
      .withColumn("target_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", ceil(col("height") * col("scale")).cast("int"))
}
