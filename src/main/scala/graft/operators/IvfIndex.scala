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
  *
  * Cluster ids are arbitrary non-negative ints, NOT positions: a partial
  * [[repair]] retires split clusters' ids and mints fresh ones, so every
  * read path maps ranked centroid POSITIONS back to stored ids
  * ([[centroidEntries]]) instead of assuming 0..k-1 contiguity.
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
    val centroids = SimilaritySearch.ivfTrain(vectors, idCol, vecCol, k, iters, sampleFraction)
    writeCentroids(spark, centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq,
      s"$indexDir/centroids")
    vectors
      .select(col(idCol).as("id"), col(vecCol).as("embedding"))
      .withColumn("cluster", SimilaritySearch.nearestCentroid(col("embedding"), centroids))
      // one writer task per cluster directory; write parallelism = k, which
      // is the right knob at scale too — IVF k grows ~√n with the corpus
      // (10⁴-10⁵ clusters at billions of vectors), so tasks stay balanced
      .repartition(col("cluster"))
      .write.mode(SaveMode.Overwrite).partitionBy("cluster").parquet(s"$indexDir/data")
    // staleness bookkeeping: the trained base size — total (r16) and
    // PER CLUSTER (r17, what [[repair]] selects stale clusters against) —
    // from footer metadata of what was just written; driver-side, no job
    val perCluster = clusterRowCounts(s"$indexDir/data")
    writeBaseCounts(indexDir, perCluster)
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
    * pre-r16 index without staleness metadata. Since r17 the advisory's
    * cheap remedy is [[repair]] (split only the clusters that absorbed
    * the mass) rather than a full retrain. */
  def append(newVectors: DataFrame, idCol: String, vecCol: String, indexDir: String): Double = {
    val spark = newVectors.sparkSession
    val entries = centroidEntries(spark, indexDir)
    val cents = entries.map(_._2).toArray
    val ids = entries.map(_._1).toArray
    newVectors
      .select(col(idCol).as("id"), col(vecCol).as("embedding"))
      // nearestCentroid answers a POSITION in the matrix; store the ID
      // (identical for a never-repaired index, where ids are 0..k-1)
      .withColumn("cluster", element_at(lit(ids),
        SimilaritySearch.nearestCentroid(col("embedding"), cents) + 1))
      .repartition(col("cluster"))
      .write.mode(SaveMode.Append).partitionBy("cluster").parquet(s"$indexDir/data")
    val frac = appendedFraction(indexDir)
    if (frac >= DefaultRebuildFraction &&
        rebuildAdvised.add(new java.io.File(indexDir).getAbsolutePath))
      System.err.println(
        f"[ivf] index $indexDir: appended fraction $frac%.2f >= " +
          f"$DefaultRebuildFraction%.2f of the trained base — recall at fixed " +
          "nprobe degrades under stale centroids (BASELINE.md r16); repair " +
          "with IvfIndex.repair (splits only the absorbed clusters), rebuild " +
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

  /** What one [[repair]] did — the probe's files-rewritten evidence. */
  final case class RepairStats(
      clustersSplit: Int,
      rowsReclustered: Long,
      filesWritten: Int,
      filesRetired: Int,
      centroidsBefore: Int,
      centroidsAfter: Int)

  /** PARTIAL rebuild (VERDICT r16 task 6): split only the clusters that
    * absorbed appended mass, leaving every untouched cluster directory in
    * place — the cheap alternative to the one remaining O(corpus)
    * maintenance step (a full retrain) in the IVF family.
    *
    * Selection: a cluster is stale when its appended rows reach
    * `staleFraction` of its trained base (per-cluster counts written by
    * [[build]]; a cluster with no trained base that absorbed any appends
    * is stale by definition). Each stale cluster is re-clustered LOCALLY
    * — deterministic Lloyd over just its rows ([[SimilaritySearch
    * .ivfTrain]]) into ~currentRows/meanBaseClusterSize children (min 2,
    * capped) — so repair cost tracks the appended mass, never the corpus.
    * The centroid set GROWS; split ids are retired, children take fresh
    * ids.
    *
    * Crash ordering (single-maintainer, like [[build]]): (1) children are
    * written under FRESH cluster ids — invisible to readers, who probe
    * only ids the centroid file knows; (2) the centroid file is replaced
    * via stage-and-rename — after this instant readers see the children
    * and never the retired ids; (3) retired cluster dirs are deleted.
    * A crash between (2) and (3) leaves unreferenced dirs that the next
    * repair garbage-collects; a crash before (2) leaves the index exactly
    * as it was plus invisible garbage. Readers never see duplicates.
    *
    * Requires per-cluster bookkeeping (an r17 [[build]]); older indexes
    * fail loudly — rebuild once to opt in. */
  def repair(
      spark: SparkSession,
      indexDir: String,
      staleFraction: Double = DefaultRebuildFraction,
      maxChildrenPerSplit: Int = 16,
      iters: Int = 2): RepairStats = {
    val dataDir = s"$indexDir/data"
    val entries = centroidEntries(spark, indexDir)
    val baseCounts = readBaseCounts(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir predates per-cluster bookkeeping (no base_counts) — " +
        "IvfIndex.repair needs an r17 build; rebuild once with IvfIndex.build"))
    val knownIds = entries.map(_._1).toSet

    // GC: dirs a prior crash left unreferenced (their ids are unknown to
    // the centroid file, so no reader ever probed them)
    clusterDirs(dataDir).filterNot { case (id, _) => knownIds(id) }
      .foreach { case (_, d) => deleteRecursively(d) }

    val current = clusterRowCounts(dataDir)
    val meanBase = {
      val bs = baseCounts.values.filter(_ > 0L)
      if (bs.isEmpty) 1L else math.max(1L, bs.sum / bs.size)
    }
    val stale = entries.map(_._1).filter { id =>
      val base = baseCounts.getOrElse(id, 0L)
      val appended = current.getOrElse(id, 0L) - base
      if (base <= 0L) appended > 0L
      else appended.toDouble / base >= staleFraction
    }
    if (stale.isEmpty)
      return RepairStats(0, 0L, 0, 0, entries.size, entries.size)

    var nextId = entries.map(_._1).max + 1
    var rows = 0L
    var written = 0
    var retired = 0
    val newEntries = scala.collection.mutable.ArrayBuffer[(Int, Array[Float])]()
    val newBase = scala.collection.mutable.Map[Int, Long]() ++ baseCounts
    stale.foreach { id =>
      val clusterPath = s"$dataDir/cluster=$id"
      val dfc = spark.read.parquet(clusterPath) // (id, embedding) — the
      // partition column is not materialized when reading the dir directly
      val nRows = current.getOrElse(id, 0L)
      val children = math.min(maxChildrenPerSplit,
        math.max(2L, (nRows + meanBase - 1) / meanBase)).toInt
      val childCents = SimilaritySearch.ivfTrain(dfc, "id", "embedding", children, iters)
      val childIds = Array.tabulate(childCents.length)(j => nextId + j)
      nextId += childCents.length
      // (1) children under fresh ids — Append never touches existing dirs
      dfc
        .withColumn("cluster", element_at(lit(childIds),
          SimilaritySearch.nearestCentroid(col("embedding"), childCents) + 1))
        .repartition(col("cluster"))
        .write.mode(SaveMode.Append).partitionBy("cluster").parquet(dataDir)
      newEntries ++= childIds.zip(childCents)
      newBase -= id
      rows += nRows
      written += childIds.map(cid => dataFiles(s"$dataDir/cluster=$cid").size).sum
      retired += dataFiles(clusterPath).size
    }
    // children become trained structure: their CURRENT rows are the base
    val childCounts = clusterRowCounts(dataDir)
    newEntries.foreach { case (cid, _) => newBase(cid) = childCounts.getOrElse(cid, 0L) }

    // (2) commit: stage-and-rename the centroid file, then the counts
    val staleSet = stale.toSet
    val finalEntries = entries.filterNot(e => staleSet(e._1)) ++ newEntries
    writeCentroids(spark, finalEntries, s"$indexDir/centroids_stage")
    swapDir(s"$indexDir/centroids_stage", s"$indexDir/centroids")
    writeBaseCounts(indexDir, newBase.toMap)

    // (3) retire the split dirs — now invisible to every reader
    stale.foreach(id => deleteRecursively(new java.io.File(s"$dataDir/cluster=$id")))
    RepairStats(stale.size, rows, written, retired, entries.size, finalEntries.size)
  }

  /** Total data rows from parquet footers (block row counts) — a
    * driver-side walk of the cluster directories, no Spark job. */
  private def footerRowCount(dataDir: String): Long =
    walkDataFiles(new java.io.File(dataDir)).map(fileRowCount).sum

  private def fileRowCount(file: java.io.File): Long = {
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getPath), conf))
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }

  private def walkDataFiles(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walkDataFiles)
    else if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
      !f.getName.startsWith(".")) Seq(f)
    else Seq.empty

  private def dataFiles(dir: String): Seq[java.io.File] =
    walkDataFiles(new java.io.File(dir))

  /** (clusterId, dir) for every `cluster=N` child of the data dir. */
  private def clusterDirs(dataDir: String): Seq[(Int, java.io.File)] =
    Option(new java.io.File(dataDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
      .flatMap(f => f.getName.stripPrefix("cluster=").toIntOption.map(_ -> f))

  /** Per-cluster row counts from footers — driver-side, no Spark job. */
  private def clusterRowCounts(dataDir: String): Map[Int, Long] =
    clusterDirs(dataDir).map { case (id, d) =>
      id -> walkDataFiles(d).map(fileRowCount).sum
    }.toMap

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Replace `target` with `stage` via renames: readers see the old set or
    * the new set; the only crash window is a loud missing-dir failure,
    * never a silently partial centroid matrix. */
  private def swapDir(stage: String, target: String): Unit = {
    val (s, t) = (new java.io.File(stage), new java.io.File(target))
    val old = new java.io.File(target + "_old")
    if (old.exists()) deleteRecursively(old)
    if (t.exists() && !t.renameTo(old))
      throw new java.io.IOException(s"could not retire $target")
    if (!s.renameTo(t))
      throw new java.io.IOException(s"could not promote $stage to $target")
    deleteRecursively(old)
  }

  private def writeCentroids(spark: SparkSession,
      entries: Seq[(Int, Array[Float])], path: String): Unit = {
    import spark.implicits._
    entries.toDF("cluster", "centroid")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
    ()
  }

  /** Bookkeeping files: `base_count` (total, r16 — [[appendedFraction]])
    * and `base_counts` (per cluster, r17 — [[repair]] selection). Written
    * together so they can never disagree. */
  private def writeBaseCounts(indexDir: String, perCluster: Map[Int, Long]): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$indexDir/base_count"), perCluster.values.sum.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$indexDir/base_counts"),
      perCluster.toSeq.sorted.map { case (id, n) => s"$id $n" }.mkString("\n"))
    ()
  }

  private def readBaseCounts(indexDir: String): Option[Map[Int, Long]] = {
    val f = new java.io.File(s"$indexDir/base_counts")
    if (!f.exists()) None
    else Some(java.nio.file.Files.readString(f.toPath).linesIterator
      .filter(_.nonEmpty)
      .map { l => val Array(id, n) = l.split(' '); id.toInt -> n.toLong }
      .toMap)
  }

  /** The persisted (clusterId, centroid) pairs, id-ordered. Ids are NOT
    * positions after a [[repair]] — use this, not [[centroids]], wherever
    * a ranked position must map back to a stored id. */
  def centroidEntries(spark: SparkSession, indexDir: String): Seq[(Int, Array[Float])] = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/centroids")
      .orderBy(col("cluster"))
      .select(col("cluster"), col("centroid"))
      .as[(Int, Array[Float])].collect().toSeq
  }

  /** The persisted centroid matrix, cluster-id-ordered. */
  def centroids(spark: SparkSession, indexDir: String): Array[Array[Float]] =
    centroidEntries(spark, indexDir).map(_._2).toArray

  /** Top-k by cosine over the `nprobe` clusters nearest the probe. The
    * cluster restriction is an `isin` on the PARTITION column — directory
    * pruning at the scan, verified in SimilaritySpec. */
  def search(
      spark: SparkSession,
      indexDir: String,
      probe: Array[Float],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val entries = centroidEntries(spark, indexDir)
    val ranked = SimilaritySearch.rankClusters(
      entries.map(_._2).toArray, probe, math.max(nprobe, 1))
    val probeClusters = ranked.map(pos => entries(pos)._1)
    spark.read.parquet(s"$indexDir/data")
      .where(col("cluster").isin(probeClusters: _*))
      .select(col("id"),
        round(VectorOps.cosineFast(col("embedding"), lit(probe).cast("array<float>")), 6).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }
}
