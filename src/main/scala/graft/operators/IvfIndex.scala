package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) vector index — the disk layout behind
  * [[SimilaritySearch.ivfTopK]], and the second of the engine's two
  * Pinecone-analog read paths (the first is the CDC sink's sign-bucket
  * `simb` partitioning, `Cdc.SimBits`).
  *
  * Build once: train coarse centroids (deterministic Lloyd,
  * [[SimilaritySearch.ivfTrain]]), assign every vector to its nearest
  * centroid, and write the vectors PARTITIONED BY cluster with the
  * centroid matrix alongside. Search: load the k×dim centroid matrix
  * (driver-size by construction), rank clusters against the probe, and
  * scan only the `nprobe` nearest cluster directories — partition pruning
  * does the candidate restriction, so a 100 TB index reads nprobe/k of its
  * bytes per query instead of all of them. Recall rises with nprobe;
  * nprobe >= k is an exact scan.
  *
  * Unlike sign-bucket locality (fixed hyperplanes), IVF centroids adapt to
  * the corpus distribution — the right trade when vectors are clustered
  * (real embedding corpora) rather than isotropic.
  */
object IvfIndex {

  /** Train, assign, persist. One pass for training (sampled), one for the
    * partitioned write; the only driver-resident state is k×dim floats. */
  def build(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      k: Int = 16,
      iters: Int = 3,
      sampleFraction: Double = 1.0): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val centroids = SimilaritySearch.ivfTrain(vectors, idCol, vecCol, k, iters, sampleFraction)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cluster", "centroid")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/centroids")
    vectors
      .select(col(idCol).as("id"), col(vecCol).as("embedding"))
      .withColumn("cluster", SimilaritySearch.nearestCentroid(col("embedding"), centroids))
      // one writer task per cluster directory; write parallelism = k, which
      // is the right knob at scale too — IVF k grows ~√n with the corpus
      // (10⁴-10⁵ clusters at billions of vectors), so tasks stay balanced
      .repartition(col("cluster"))
      .write.mode(SaveMode.Overwrite).partitionBy("cluster").parquet(s"$indexDir/data")
  }

  /** Incremental maintenance — the Pinecone-upsert analog for the IVF
    * layout: route new vectors to their nearest EXISTING centroid and
    * append them as new files inside only those cluster directories. No
    * retraining, no rewrite of untouched clusters, and [[search]] needs no
    * change — with nprobe=k the appended index is still an exact scan of
    * base ∪ new (SimilaritySpec asserts parity with brute force).
    *
    * Contract: appended ids are NEW ids (the CDC path guarantees this —
    * content-hash ids are deduped by the sink upsert upstream); an id
    * appended twice would surface twice. Centroids drift as the corpus
    * distribution shifts: production re-trains on a cadence driven by
    * recall monitoring, while append keeps the index serving between
    * retrains — the standard IVF operational trade (Jégou et al.). */
  def append(newVectors: DataFrame, idCol: String, vecCol: String, indexDir: String): Unit = {
    val spark = newVectors.sparkSession
    val cents = centroids(spark, indexDir)
    newVectors
      .select(col(idCol).as("id"), col(vecCol).as("embedding"))
      .withColumn("cluster", SimilaritySearch.nearestCentroid(col("embedding"), cents))
      .repartition(col("cluster"))
      .write.mode(SaveMode.Append).partitionBy("cluster").parquet(s"$indexDir/data")
  }

  /** The persisted centroid matrix, cluster-ordered. */
  def centroids(spark: SparkSession, indexDir: String): Array[Array[Float]] = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/centroids")
      .orderBy(col("cluster"))
      .select(col("centroid")).as[Array[Float]].collect()
  }

  /** Top-k by cosine over the `nprobe` clusters nearest the probe. The
    * cluster restriction is an `isin` on the PARTITION column — directory
    * pruning at the scan, verified in SimilaritySpec. */
  def search(
      spark: SparkSession,
      indexDir: String,
      probe: Array[Float],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val cents = centroids(spark, indexDir)
    val probeClusters = SimilaritySearch.rankClusters(cents, probe, math.max(nprobe, 1))
    spark.read.parquet(s"$indexDir/data")
      .where(col("cluster").isin(probeClusters: _*))
      .select(col("id"),
        round(VectorOps.cosineFast(col("embedding"), lit(probe).cast("array<float>")), 6).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }
}
