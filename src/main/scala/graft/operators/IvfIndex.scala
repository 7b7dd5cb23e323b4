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
  *
  * Metadata layout (r18): the per-cluster trained-base counts
  * (`_base_counts`) and per-cluster appended counts (`_appended_counts`)
  * live INSIDE the centroid directory — underscore-prefixed, so Spark's
  * parquet listing ignores them — and are therefore committed atomically
  * with the centroid matrix by the same stage-and-rename swap
  * ([[swapDir]]): a crash can never leave centroids naming clusters the
  * counts don't know, or vice versa (ADVICE r17 — the r17 layout wrote
  * the counts as a second, separate commit). Staleness bookkeeping is
  * INCREMENTAL (VERDICT r17 task 1): [[append]] counts what it just
  * routed (one O(batch) aggregation) and merges it into the sidecar, so
  * per-batch bookkeeping cost is flat in index size — the r17 shape
  * re-walked EVERY parquet footer in the index per append batch, O(index
  * files) driver work that at a 100 TB index (~800k files) is hours per
  * maintenance call. The footer recount survives as the audit/recovery
  * path ([[recountClusterRows]]; SimilaritySpec pins sidecar == recount
  * after mixed append/repair/rebuild sequences). */
object IvfIndex {

  /** Appended fraction at which [[append]] advises a rebuild — set from
    * the measured recall-drift ladder (BASELINE.md r16: with appends drawn
    * from a SHIFTED distribution — the adversarial case — recall@10 at
    * nprobe=2 degrades as stale centroids under-describe the appended
    * mass; at-distribution appends barely move it). 0.5 = advise once the
    * appended mass reaches half the trained base. The same threshold is
    * the PER-CLUSTER stale bar ([[staleClusters]], [[repair]] selection). */
  val DefaultRebuildFraction: Double = 0.5

  /** Share of clusters stale at which [[maintain]] prefers a full
    * [[rebuildInPlace]] over a partial [[repair]] — read off the r17
    * ladder (BASELINE.md r17): under corpus-wide drift repair degenerates
    * to a full rewrite with LOCAL centroids (matched rebuild's recall at
    * 5× shifted mass but rewrote ~100% of rows for it), so once half the
    * clusters are stale the global retrain is the same write bill with
    * strictly better centroids. */
  val DefaultRebuildClusterShare: Double = 0.5

  /** Advisory sink — stderr in production; SimilaritySpec swaps in a
    * buffer to pin that the concentrated-drift advisory fires exactly
    * once and names the absorbed cluster (the [[graft.operators.Cdc]]
    * `onBeforeCommit` test-hook precedent). */
  private[graft] var onAdvisory: String => Unit = m => System.err.println(m)

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
    vectors
      .select(col(idCol).as("id"), col(vecCol).as("embedding"))
      .withColumn("cluster", SimilaritySearch.nearestCentroid(col("embedding"), centroids))
      // one writer task per cluster directory; write parallelism = k, which
      // is the right knob at scale too — IVF k grows ~√n with the corpus
      // (10⁴-10⁵ clusters at billions of vectors), so tasks stay balanced
      .repartition(col("cluster"))
      .write.mode(SaveMode.Overwrite).partitionBy("cluster").parquet(s"$indexDir/data")
    // trained-base bookkeeping from footer metadata of what was just
    // written (driver-side, O(what this build wrote) — the index IS the
    // build's output here, so the walk is the incremental cost, not a
    // re-walk); committed beside the centroid matrix in one directory
    val perCluster = clusterRowCounts(s"$indexDir/data")
    writeCentroids(spark, centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq,
      s"$indexDir/centroids", perCluster, Map.empty)
    resetAdvisories(indexDir) // a rebuild over the same dir closes the episode
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
    * Staleness is BOUNDED, tracked INCREMENTALLY, and advised at two
    * grains (VERDICT r17 tasks 1-2):
    *  - bookkeeping: the batch's per-cluster routed counts (one O(batch)
    *    aggregation over the cached batch — never a walk of the index)
    *    merge into the `_appended_counts` sidecar; per-batch cost is flat
    *    in index size (IvfProbe `bookkeeping` ladder).
    *  - GLOBAL advisory: once total appended mass crosses
    *    [[DefaultRebuildFraction]] of the trained base, advise a rebuild
    *    (recall at fixed nprobe degrades corpus-wide, BASELINE.md r16).
    *  - PER-CLUSTER advisory: concentrated drift (all appends near one
    *    unseen center — BASELINE.md r17's own scenario) makes ONE cluster
    *    stale at a global fraction of ~0.03, far below the global bar, and
    *    that absorbed cluster silently degrades into a per-probe scan
    *    hotspot; advise [[repair]] (the cheap remedy — splits only the
    *    absorbed clusters) as soon as ANY cluster crosses the stale bar.
    * Each advisory fires once per index per process. Returns the
    * post-append global appended fraction; NaN for a pre-r16 index
    * without staleness metadata (bookkeeping is then skipped entirely).
    *
    * Crash window: the data write commits before the sidecar merge, so a
    * crash between them UNDER-counts appended rows — staleness is then
    * detected late, never wrongly; reads are unaffected (they never
    * consult the counts). [[recountClusterRows]] is the audit that
    * re-derives truth from footers. */
  def append(newVectors: DataFrame, idCol: String, vecCol: String, indexDir: String): Double = {
    val spark = newVectors.sparkSession
    val entries = centroidEntries(spark, indexDir)
    val cents = entries.map(_._2).toArray
    val ids = entries.map(_._1).toArray
    val routed = newVectors
      .select(col(idCol).as("id"), col(vecCol).as("embedding"))
      // nearestCentroid answers a POSITION in the matrix; store the ID
      // (identical for a never-repaired index, where ids are 0..k-1)
      .withColumn("cluster", element_at(lit(ids),
        SimilaritySearch.nearestCentroid(col("embedding"), cents) + 1))
      // cached: the write and the bookkeeping count both consume the
      // routed batch — the upstream (and the nearest-centroid scoring)
      // must run once, not twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      routed
        .repartition(col("cluster"))
        .write.mode(SaveMode.Append).partitionBy("cluster").parquet(s"$indexDir/data")
      // incremental bookkeeping: O(batch), flat in index size (r18)
      val batchCounts = routed.groupBy("cluster").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      mergeAppendedCounts(indexDir, batchCounts)
    } finally { routed.unpersist(); () }

    val frac = appendedFraction(indexDir)
    val key = new java.io.File(indexDir).getAbsolutePath
    if (frac >= DefaultRebuildFraction && rebuildAdvised.add(key))
      onAdvisory(
        f"[ivf] index $indexDir: appended fraction $frac%.2f >= " +
          f"$DefaultRebuildFraction%.2f of the trained base — recall at fixed " +
          "nprobe degrades under stale centroids (BASELINE.md r16); rebuild " +
          "with IvfIndex.build/rebuildInPlace, or let IvfIndex.maintain choose")
    else {
      val stale = staleClusters(indexDir)
      if (stale.nonEmpty && repairAdvised.add(key))
        onAdvisory(
          f"[ivf] index $indexDir: cluster ${stale.head.cluster} absorbed " +
            f"${stale.head.appendedRows} appended rows against a trained base of " +
            f"${stale.head.baseRows} (${stale.size} stale cluster(s) total at " +
            f"global appended fraction $frac%.2f) — a concentrated hotspot scans " +
            "long before the global rebuild bar; repair with IvfIndex.repair " +
            "(splits only the absorbed clusters), or let IvfIndex.maintain choose")
    }
    frac
  }
  // advise once per index per DRIFT EPISODE — a maintenance loop appending
  // on a cadence must not spam stderr every batch (same shape as the CDC
  // store's shard advisory), but a successful repair/rebuild closes the
  // episode ([[resetAdvisories]]) so the NEXT accumulation advises again
  // (r18 — the r17 once-per-process key silenced every episode after the
  // first for the life of the driver). Global-rebuild and
  // per-cluster-repair advisories are tracked separately (a repaired
  // index can later cross the global bar).
  private val rebuildAdvised =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val repairAdvised =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def resetAdvisories(indexDir: String): Unit = {
    val key = new java.io.File(indexDir).getAbsolutePath
    rebuildAdvised.remove(key)
    repairAdvised.remove(key)
    ()
  }

  /** Appended rows / trained-base rows, from the sidecar counts —
    * driver-side, TWO small file reads, no footer walk (r18). A pre-r18
    * index (legacy root-level `base_count`) answers from the footer
    * recount exactly as r16/r17 did; NaN when the index predates
    * staleness bookkeeping entirely. */
  def appendedFraction(indexDir: String): Double =
    readCounts(s"$indexDir/centroids/$BaseCountsFile") match {
      case Some(base) =>
        val b = base.values.sum
        if (b <= 0L) Double.NaN
        else readCounts(s"$indexDir/centroids/$AppendedCountsFile")
          .getOrElse(Map.empty).values.sum.toDouble / b
      case None =>
        // legacy (pre-r18) layout: root base_count + footer recount
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

  /** One cluster's staleness: how much appended mass sits under a centroid
    * trained on `baseRows` rows. A cluster with no trained base that
    * absorbed any appends is infinitely stale by definition. */
  final case class ClusterStaleness(cluster: Int, baseRows: Long, appendedRows: Long) {
    def fraction: Double =
      if (baseRows <= 0L) (if (appendedRows > 0L) Double.PositiveInfinity else 0.0)
      else appendedRows.toDouble / baseRows
  }

  /** The staleness report (VERDICT r17 task 2): every cluster whose
    * appended mass crossed `staleFraction` of its trained base, most
    * stale first — the operator-facing form of [[repair]]'s selection,
    * and the `/ivf/status` payload. Sidecar reads only — no footer walk,
    * no Spark job. Empty for a healthy index AND for a pre-bookkeeping
    * index (which opted out — [[appendedFraction]] is NaN there). */
  def staleClusters(
      indexDir: String,
      staleFraction: Double = DefaultRebuildFraction): Seq[ClusterStaleness] = {
    readCounts(s"$indexDir/centroids/$BaseCountsFile")
      .orElse(readCounts(s"$indexDir/base_counts")) match {
      case None => Seq.empty
      case Some(base) =>
        val appended = sidecarAppendedCounts(indexDir, base)
        (base.keySet ++ appended.keySet).toSeq
          .map(id => ClusterStaleness(id, base.getOrElse(id, 0L), appended.getOrElse(id, 0L)))
          .filter(s => s.fraction >= staleFraction)
          .sortBy(s => (-s.fraction, s.cluster))
    }
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
    * `staleFraction` of its trained base ([[staleClusters]] — sidecar
    * counts, no footer walk; a cluster with no trained base that absorbed
    * any appends is stale by definition). Each stale cluster is
    * re-clustered LOCALLY — deterministic Lloyd over just its rows
    * ([[SimilaritySearch.ivfTrain]]) into ~currentRows/meanBaseClusterSize
    * children (min 2, capped) — so repair cost tracks the appended mass,
    * never the corpus. The centroid set GROWS; split ids are retired,
    * children take fresh ids.
    *
    * Stale clusters are processed CONCURRENTLY on a driver-side pool of
    * `parallelism` threads (VERDICT r17 task 3 — the serial r17 foreach
    * paid per-cluster Spark-job fixed cost one at a time; the fix is the
    * same shape as `Cdc.syncCycleOutcomes`' table pool). Each split
    * writes its children to a PRIVATE staging directory and the driver
    * moves the finished `cluster=N` dirs into `data/` — concurrent Spark
    * writers never share an output root (two jobs appending one root race
    * on the committer's `_temporary`), and a rename per child dir is the
    * whole serialization cost.
    *
    * Crash ordering (single-maintainer, like [[build]]): (1) children are
    * written under FRESH cluster ids — invisible to readers, who probe
    * only ids the centroid file knows; (2) the centroid directory —
    * centroid matrix AND both count sidecars, one directory since r18 —
    * is replaced via a single stage-and-rename: after this instant
    * readers see the children, the new counts, and never the retired ids,
    * and no crash can leave the matrix and the counts disagreeing
    * (ADVICE r17 — the r17 two-file commit could); (3) retired cluster
    * dirs are deleted. A crash between (2) and (3) leaves unreferenced
    * dirs that the next repair garbage-collects; a crash before (2)
    * leaves the index exactly as it was plus invisible garbage. Readers
    * never see duplicates.
    *
    * Requires per-cluster bookkeeping (an r17+ [[build]]); older indexes
    * fail loudly — rebuild once to opt in. */
  def repair(
      spark: SparkSession,
      indexDir: String,
      staleFraction: Double = DefaultRebuildFraction,
      maxChildrenPerSplit: Int = 16,
      iters: Int = 2,
      parallelism: Int = 8): RepairStats = {
    val dataDir = s"$indexDir/data"
    val entries = centroidEntries(spark, indexDir)
    val baseCounts = readCounts(s"$indexDir/centroids/$BaseCountsFile")
      .orElse(readCounts(s"$indexDir/base_counts"))
      .getOrElse(throw new IllegalStateException(
        s"$indexDir predates per-cluster bookkeeping (no base counts) — " +
          "IvfIndex.repair needs an r17+ build; rebuild once with IvfIndex.build"))
    val appendedCounts = sidecarAppendedCounts(indexDir, baseCounts)
    val knownIds = entries.map(_._1).toSet

    // GC: dirs a prior crash left unreferenced (their ids are unknown to
    // the centroid file, so no reader ever probed them) + orphaned staging
    clusterDirs(dataDir).filterNot { case (id, _) => knownIds(id) }
      .foreach { case (_, d) => deleteRecursively(d) }
    deleteRecursively(new java.io.File(s"$indexDir/repair_stage"))
    deleteRecursively(new java.io.File(s"$indexDir/rebuild_stage"))

    val meanBase = {
      val bs = baseCounts.values.filter(_ > 0L)
      if (bs.isEmpty) 1L else math.max(1L, bs.sum / bs.size)
    }
    val stale = entries.map(_._1).filter { id =>
      val base = baseCounts.getOrElse(id, 0L)
      val appended = appendedCounts.getOrElse(id, 0L)
      if (base <= 0L) appended > 0L
      else appended.toDouble / base >= staleFraction
    }
    if (stale.isEmpty)
      return RepairStats(0, 0L, 0, 0, entries.size, entries.size)

    val nextId = new java.util.concurrent.atomic.AtomicInteger(entries.map(_._1).max + 1)
    final case class Split(
        retiredId: Int,
        childEntries: Seq[(Int, Array[Float])],
        rows: Long,
        filesWritten: Int,
        filesRetired: Int)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, stale.size)))
    val splits: Seq[Split] =
      try {
        val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val futures = stale.map { id =>
          scala.concurrent.Future {
            val clusterPath = s"$dataDir/cluster=$id"
            val dfc = spark.read.parquet(clusterPath) // (id, embedding) — the
            // partition column is not materialized when reading the dir directly
            // exact row count from THIS cluster's footers — O(split), and
            // robust to a sidecar that under-counted across a crash
            val nRows = dataFiles(clusterPath).map(fileRowCount).sum
            val children = math.min(maxChildrenPerSplit,
              math.max(2L, (nRows + meanBase - 1) / meanBase)).toInt
            val childCents = SimilaritySearch.ivfTrain(dfc, "id", "embedding", children, iters)
            val idBase = nextId.getAndAdd(childCents.length)
            val childIds = Array.tabulate(childCents.length)(idBase + _)
            // (1) children under fresh ids, via a PRIVATE staging root —
            // finished cluster dirs are renamed into data/ (distinct names
            // by construction, so concurrent splits never collide)
            val stageRoot = s"$indexDir/repair_stage/split_$id"
            dfc
              .withColumn("cluster", element_at(lit(childIds),
                SimilaritySearch.nearestCentroid(col("embedding"), childCents) + 1))
              .repartition(col("cluster"))
              .write.mode(SaveMode.Overwrite).partitionBy("cluster").parquet(stageRoot)
            var moved = 0
            childIds.foreach { cid =>
              val from = new java.io.File(s"$stageRoot/cluster=$cid")
              if (from.exists()) { // a child Lloyd left empty gets no dir
                java.nio.file.Files.move(from.toPath,
                  java.nio.file.Paths.get(s"$dataDir/cluster=$cid"))
                moved += dataFiles(s"$dataDir/cluster=$cid").size
              }
            }
            Split(id, childIds.zip(childCents).toSeq, nRows, moved,
              dataFiles(clusterPath).size)
          }(ec)
        }
        futures.map(f =>
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      } finally { pool.shutdown(); () }
    deleteRecursively(new java.io.File(s"$indexDir/repair_stage"))

    // children become trained structure: their CURRENT rows are the base,
    // their appended count zero; untouched clusters keep both counts
    val staleSet = stale.toSet
    val newEntries = splits.flatMap(_.childEntries)
    val newBase = scala.collection.mutable.Map[Int, Long]() ++
      (baseCounts -- staleSet)
    val newAppended = scala.collection.mutable.Map[Int, Long]() ++
      (appendedCounts -- staleSet).filter(_._2 != 0L)
    newEntries.foreach { case (cid, _) =>
      newBase(cid) = dataFiles(s"$dataDir/cluster=$cid").map(fileRowCount).sum
    }

    // (2) commit: matrix + both count sidecars in ONE staged dir, promoted
    // by a single rename — never a window where they disagree (r18)
    val finalEntries = entries.filterNot(e => staleSet(e._1)) ++ newEntries
    writeCentroids(spark, finalEntries, s"$indexDir/centroids",
      newBase.toMap, newAppended.toMap)

    // (3) retire the split dirs — now invisible to every reader
    stale.foreach(id => deleteRecursively(new java.io.File(s"$dataDir/cluster=$id")))
    resetAdvisories(indexDir) // episode closed: the next drift advises anew
    RepairStats(stale.size, splits.map(_.rows).sum, splits.map(_.filesWritten).sum,
      splits.map(_.filesRetired).sum, entries.size, finalEntries.size)
  }

  /** Full retrain of a LIVE index in place — global Lloyd over the whole
    * current corpus (base ∪ appends), committed with [[repair]]'s crash
    * machinery: new clusters under fresh ids (invisible until commit),
    * one atomic centroid-directory swap, then retirement of every old
    * dir. The remedy for corpus-wide drift, where [[repair]]'s per-cluster
    * LOCAL retrains rewrite ~everything anyway but keep centroids blind to
    * cross-cluster structure (BASELINE.md r17's shifted-everywhere ladder).
    * Serving never pauses: readers resolve the old snapshot until the
    * swap, the new one after. `k` 0 keeps the current cluster count. */
  def rebuildInPlace(
      spark: SparkSession,
      indexDir: String,
      k: Int = 0,
      iters: Int = 3,
      sampleFraction: Double = 1.0): Int = {
    val dataDir = s"$indexDir/data"
    val entries = centroidEntries(spark, indexDir)
    val kEff = if (k > 0) k else entries.size
    val all = spark.read.parquet(dataDir).select(col("id"), col("embedding"))
    val cents = SimilaritySearch.ivfTrain(all, "id", "embedding", kEff, iters, sampleFraction)
    val firstId = entries.map(_._1).max + 1
    val ids = Array.tabulate(cents.length)(firstId + _)
    val stageRoot = s"$indexDir/rebuild_stage"
    deleteRecursively(new java.io.File(stageRoot))
    all
      .withColumn("cluster", element_at(lit(ids),
        SimilaritySearch.nearestCentroid(col("embedding"), cents) + 1))
      .repartition(col("cluster"))
      .write.mode(SaveMode.Overwrite).partitionBy("cluster").parquet(stageRoot)
    ids.foreach { cid =>
      val from = new java.io.File(s"$stageRoot/cluster=$cid")
      if (from.exists())
        java.nio.file.Files.move(from.toPath,
          java.nio.file.Paths.get(s"$dataDir/cluster=$cid"))
    }
    deleteRecursively(new java.io.File(stageRoot))
    val newBase = ids.map(cid =>
      cid -> dataFiles(s"$dataDir/cluster=$cid").map(fileRowCount).sum).toMap
    // atomic commit: fresh matrix + fresh base counts + zero appended
    writeCentroids(spark, ids.zip(cents).toSeq, s"$indexDir/centroids",
      newBase, Map.empty)
    // retire every pre-rebuild dir (now unreferenced)
    entries.foreach { case (id, _) =>
      deleteRecursively(new java.io.File(s"$dataDir/cluster=$id"))
    }
    resetAdvisories(indexDir) // episode closed: the next drift advises anew
    cents.length
  }

  /** What [[maintain]] decided and did. */
  sealed trait MaintainAction
  case object MaintainNoOp extends MaintainAction
  final case class MaintainRepaired(stats: RepairStats) extends MaintainAction
  final case class MaintainRebuilt(centroids: Int) extends MaintainAction

  /** The maintenance chooser (VERDICT r17 task 4) — encodes the two
    * measured drift regimes onto the three tools:
    *  - no cluster stale            → no-op (append-and-serve);
    *  - some clusters stale, under
    *    `rebuildClusterShare` of all → [[repair]] (concentrated drift —
    *    BASELINE.md r17: 1/16 clusters split, 0.37 of rows rewritten,
    *    recall held);
    *  - stale share ≥ the bar       → [[rebuildInPlace]] (corpus-wide
    *    drift — repair would rewrite ~everything with strictly worse,
    *    local-only centroids; same ladder).
    * The default bar is [[DefaultRebuildClusterShare]]. */
  def maintain(
      spark: SparkSession,
      indexDir: String,
      staleFraction: Double = DefaultRebuildFraction,
      rebuildClusterShare: Double = DefaultRebuildClusterShare,
      parallelism: Int = 8): MaintainAction = {
    val stale = staleClusters(indexDir, staleFraction)
    if (stale.isEmpty) MaintainNoOp
    else {
      val total = centroidEntries(spark, indexDir).size
      if (total > 0 && stale.size.toDouble / total >= rebuildClusterShare)
        MaintainRebuilt(rebuildInPlace(spark, indexDir))
      else
        MaintainRepaired(repair(spark, indexDir, staleFraction,
          parallelism = parallelism))
    }
  }

  /** AUDIT path: per-cluster row counts re-derived from every parquet
    * footer — the O(index files) ground truth the incremental sidecars
    * replaced on the hot path (SimilaritySpec pins
    * base + appended == this, per cluster, after mixed maintenance). */
  def recountClusterRows(indexDir: String): Map[Int, Long] =
    clusterRowCounts(s"$indexDir/data")

  /** Per-cluster (base + appended) from the sidecars — the incremental
    * twin of [[recountClusterRows]], two small file reads. */
  def sidecarClusterRows(indexDir: String): Map[Int, Long] = {
    val base = readCounts(s"$indexDir/centroids/$BaseCountsFile")
      .orElse(readCounts(s"$indexDir/base_counts")).getOrElse(Map.empty)
    val appended = sidecarAppendedCounts(indexDir, base)
    (base.keySet ++ appended.keySet).iterator
      .map(id => id -> (base.getOrElse(id, 0L) + appended.getOrElse(id, 0L)))
      .toMap
  }

  /** Total data rows from parquet footers (block row counts) — a
    * driver-side walk of the cluster directories, no Spark job. Audit /
    * legacy-migration path only since r18 — never on the append path. */
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

  /** Sidecar file names, underscore-prefixed so Spark's parquet listing of
    * the centroid directory ignores them (the `_SUCCESS` convention). */
  private val BaseCountsFile = "_base_counts"
  private val AppendedCountsFile = "_appended_counts"

  /** Stage-and-swap the WHOLE metadata snapshot — centroid matrix plus
    * both count sidecars — as one directory: the single commit point of
    * [[build]]/[[repair]]/[[rebuildInPlace]] (ADVICE r17 — metadata files
    * written as separate commits could disagree across a crash). */
  private def writeCentroids(spark: SparkSession,
      entries: Seq[(Int, Array[Float])], path: String,
      baseCounts: Map[Int, Long], appendedCounts: Map[Int, Long]): Unit = {
    import spark.implicits._
    val stage = path + "_stage"
    entries.toDF("cluster", "centroid")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(stage)
    writeCountsFile(s"$stage/$BaseCountsFile", baseCounts)
    writeCountsFile(s"$stage/$AppendedCountsFile", appendedCounts)
    swapDir(stage, path)
    // a fresh commit supersedes any legacy (pre-r18) root-level count
    // files — drop them so no reader can ever consult a stale twin
    val indexDir = new java.io.File(path).getParentFile
    if (indexDir != null) {
      new java.io.File(indexDir, "base_count").delete()
      new java.io.File(indexDir, "base_counts").delete()
      ()
    }
  }

  private def writeCountsFile(path: String, counts: Map[Int, Long]): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      counts.toSeq.sorted.map { case (id, n) => s"$id $n" }.mkString("\n"))
    ()
  }

  private def readCounts(path: String): Option[Map[Int, Long]] = {
    val f = new java.io.File(path)
    if (!f.exists()) None
    else Some(java.nio.file.Files.readString(f.toPath).linesIterator
      .filter(_.nonEmpty)
      .map { l => val Array(id, n) = l.split(' '); id.toInt -> n.toLong }
      .toMap)
  }

  /** The appended-count sidecar, migrating a legacy (pre-r18) index on
    * first read: legacy layouts tracked only totals, so the one-time
    * migration recounts from footers (the old per-call cost, paid once)
    * and seeds the sidecar beside the legacy files for [[append]] to then
    * maintain incrementally. */
  private def sidecarAppendedCounts(
      indexDir: String, baseCounts: Map[Int, Long]): Map[Int, Long] =
    readCounts(s"$indexDir/centroids/$AppendedCountsFile").getOrElse {
      val current = clusterRowCounts(s"$indexDir/data")
      (baseCounts.keySet ++ current.keySet).iterator
        .map(id => id -> math.max(0L, current.getOrElse(id, 0L) - baseCounts.getOrElse(id, 0L)))
        .filter(_._2 != 0L)
        .toMap
    }

  /** Merge one batch's routed counts into the appended sidecar — O(batch
    * clusters) work plus one atomic file replace; no index walk (r18).
    * A bookkeeping-free index (no base counts anywhere) skips the merge:
    * it opted out, and [[appendedFraction]] stays NaN. */
  private def mergeAppendedCounts(indexDir: String, batch: Map[Int, Long]): Unit = {
    val baseOpt = readCounts(s"$indexDir/centroids/$BaseCountsFile")
      .orElse(readCounts(s"$indexDir/base_counts"))
    baseOpt match {
      case None => () // pre-r16 index: no bookkeeping to maintain
      case Some(base) =>
        // legacy migration: base counts exist only at the root → copy them
        // into the centroid dir (identical content, so the copy is safe
        // outside a swap) and seed appended from a one-time footer recount
        val baseInDir = new java.io.File(s"$indexDir/centroids/$BaseCountsFile")
        if (!baseInDir.exists()) writeCountsFile(baseInDir.getPath, base)
        val prior = sidecarAppendedCounts(indexDir, base)
        // `prior` may already include this batch (migration recounts AFTER
        // the data write): only add the batch on top of a sidecar READ,
        // never on top of a recount
        val merged =
          if (new java.io.File(s"$indexDir/centroids/$AppendedCountsFile").exists())
            (prior.keySet ++ batch.keySet).iterator
              .map(id => id -> (prior.getOrElse(id, 0L) + batch.getOrElse(id, 0L)))
              .filter(_._2 != 0L).toMap
          else prior
        val tmp = java.nio.file.Paths.get(
          s"$indexDir/centroids/.${AppendedCountsFile}_tmp")
        java.nio.file.Files.writeString(tmp,
          merged.toSeq.sorted.map { case (id, n) => s"$id $n" }.mkString("\n"))
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(s"$indexDir/centroids/$AppendedCountsFile"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
    }
  }

  /** The persisted (clusterId, centroid) pairs, id-ordered. Ids are NOT
    * positions after a [[repair]] — use this, not [[centroids]], wherever
    * a ranked position must map back to a stored id. */
  def centroidEntries(spark: SparkSession, indexDir: String): Seq[(Int, Array[Float])] = {
    import spark.implicits._
    graft.sources.Tables.cachedParquet(spark, s"$indexDir/centroids")
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
    graft.sources.Tables.cachedParquet(spark, s"$indexDir/data")
      .where(col("cluster").isin(probeClusters: _*))
      .select(col("id"),
        round(VectorOps.cosineFast(col("embedding"), lit(probe).cast("array<float>")), 6).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }
}
