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

  /** Appended fraction at which [[append]] advises a rebuild — set from
    * the measured recall-drift ladder (BASELINE.md r16: with appends drawn
    * from a SHIFTED distribution — the adversarial case — recall@10 at
    * nprobe=2 degrades as stale centroids under-describe the appended
    * mass; at-distribution appends barely move it). 0.5 = advise once the
    * appended mass reaches half the trained base. */
  val DefaultRebuildFraction: Double = 0.5

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
    // staleness bookkeeping (r16): the trained base size, from footer
    // metadata of what was just written — driver-side, no count job
    val base = footerRowCount(s"$indexDir/data")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$indexDir/base_count"), base.toString)
    ()
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
    * retrains — the standard IVF operational trade (Jégou et al.).
    *
    * Staleness is BOUNDED and advised (r16, measured in BASELINE.md):
    * returns the post-append appended fraction (appended rows / trained
    * base) and prints a one-line rebuild advisory once it crosses
    * [[DefaultRebuildFraction]] — recall at fixed nprobe degrades as
    * appends from a shifted distribution accumulate under stale
    * centroids, while exactness at nprobe=k is unaffected. NaN for a
    * pre-r16 index without staleness metadata. */
  def append(newVectors: DataFrame, idCol: String, vecCol: String, indexDir: String): Double = {
    val spark = newVectors.sparkSession
    val cents = centroids(spark, indexDir)
    newVectors
      .select(col(idCol).as("id"), col(vecCol).as("embedding"))
      .withColumn("cluster", SimilaritySearch.nearestCentroid(col("embedding"), cents))
      .repartition(col("cluster"))
      .write.mode(SaveMode.Append).partitionBy("cluster").parquet(s"$indexDir/data")
    val frac = appendedFraction(indexDir)
    if (frac >= DefaultRebuildFraction &&
        rebuildAdvised.add(new java.io.File(indexDir).getAbsolutePath))
      System.err.println(
        f"[ivf] index $indexDir: appended fraction $frac%.2f >= " +
          f"$DefaultRebuildFraction%.2f of the trained base — recall at fixed " +
          "nprobe degrades under stale centroids (BASELINE.md r16); rebuild " +
          "with IvfIndex.build, or raise nprobe until then")
    frac
  }
  // advise once per index per process — a maintenance loop appending on a
  // cadence must not spam stderr every batch (same shape as the CDC store's
  // shard advisory)
  private val rebuildAdvised =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Appended rows / trained-base rows, from parquet footer metadata —
    * driver-side, no Spark job. NaN when the index predates staleness
    * bookkeeping (no `base_count`). */
  def appendedFraction(indexDir: String): Double = {
    val meta = new java.io.File(s"$indexDir/base_count")
    if (!meta.exists()) Double.NaN
    else {
      val base = java.nio.file.Files.readString(meta.toPath).trim.toLong
      if (base <= 0L) Double.NaN
      else (footerRowCount(s"$indexDir/data") - base).toDouble / base
    }
  }

  /** The measured rebuild trigger: true once the appended mass crosses
    * `maxAppendedFraction` of the trained base (see BASELINE.md r16 for
    * the recall ladder behind the default). Unknown staleness (pre-r16
    * index) answers false — the operator opted out of bookkeeping. */
  def shouldRebuild(
      indexDir: String,
      maxAppendedFraction: Double = DefaultRebuildFraction): Boolean = {
    val f = appendedFraction(indexDir)
    !f.isNaN && f >= maxAppendedFraction
  }

  /** Total data rows from parquet footers (block row counts) — a
    * driver-side walk of the cluster directories, no Spark job. */
  private def footerRowCount(dataDir: String): Long = {
    import scala.jdk.CollectionConverters._
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")) Seq(f)
      else Seq.empty
    val conf = new org.apache.hadoop.conf.Configuration()
    walk(new java.io.File(dataDir)).map { file =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file.getPath), conf))
      try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally reader.close()
    }.sum
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
