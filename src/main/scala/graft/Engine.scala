package graft

import graft.functions.Embeddings
import graft.operators.{Cdc, SimilaritySearch}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade — everything the reference's process does, as one
  * object (`app.py` + `controller/controller.py` surface):
  *
  *  - [[initializeIndex]] ↔ `initialize_index()` (`app.py:14`,
  *    `controller/controller.py:9-15`, `service_layer/service.py:82-100`)
  *  - [[runSyncCycle]] ↔ one tick of `run_continuously()`
  *    (`controller/controller.py:17-35`)
  *  - [[runPolling]] ↔ the scheduler loop itself (fixed-delay sleep like
  *    the reference's `time.sleep(300)`; bounded cycles so it's testable)
  *  - [[searchSimilar]] ↔ the latent Pinecone read path the reference
  *    declares but never wires to a route (§3.3: `embed_query` +
  *    cosine index)
  *
  * A user of the reference switches by pointing `sourceDir` at their table
  * drops (or adapting `Tables.jdbc` for a live MySQL) and calling
  * [[runPolling]]; vectors land in the parquet vector sink instead of
  * Pinecone, queryable with [[searchSimilar]].
  */
class Engine(
    val spark: SparkSession,
    sourceDir: String,
    stateDir: String,
    sinkDir: String,
    changeCol: String = "ts",
    chunkSize: Int = 100, // service_layer/service.py:109
    layout: Cdc.SinkLayout = Cdc.DefaultLayout, // applies only when the sink is created
    autoRefreshIvf: Boolean = true) { // bound IVF staleness to one sync cycle

  /** S8: create the vector sink if absent. */
  def initializeIndex(): Unit = Cdc.initVectorSink(spark, sinkDir, layout)

  /** Serializes this engine's WRITERS — each table's sink commit +
    * watermark publish runs under it, so concurrent tables' upserts
    * read-modify-write the manifest one at a time. READERS never take
    * it: every store (vector-sink manifest, watermark pointer, IVF
    * pointer) publishes by atomic pointer flip and retains the previous
    * version until the next commit's GC, so a read resolved at any
    * instant materializes a consistent committed snapshot without
    * blocking — or being blocked by — a commit (r12 verdict task 2). */
  val commitLock = new Object

  /** One CDC sync tick over every source table. Returns rows synced.
    * When the conventional IVF index exists and the cycle landed rows,
    * the index is refreshed (atomic version swap, [[refreshIvfIndex]]) so
    * the default `/query` route's staleness is bounded by the poll
    * cadence instead of growing forever (set `autoRefreshIvf = false` to
    * manage rebuilds manually). */
  def runSyncCycle(): Map[String, Long] = {
    val synced = Cdc.syncCycle(spark, sourceDir, stateDir, sinkDir, changeCol,
      chunkSize = chunkSize, layout = layout, commitLock = commitLock)
    if (autoRefreshIvf && synced.valuesIterator.sum > 0 && hasIvfIndex()) refreshIvfIndex()
    synced
  }

  /** Consecutive failed cycles since the last success — the health signal
    * an operator (or [[runPolling]]'s own circuit breaker) watches, so a
    * failing loop is never indistinguishable from "no new data". */
  @volatile private var consecutiveFailuresVar = 0
  def consecutiveFailures: Int = consecutiveFailuresVar
  def healthy: Boolean = consecutiveFailuresVar == 0

  /** The polling scheduler (T1): fixed-delay like the reference —
    * sleep AFTER each cycle's work, so drift accumulates identically
    * (`controller/controller.py:35`). `maxCycles` bounds the loop
    * (the reference runs forever; tests and batch backfills shouldn't).
    *
    * Failure policy: a failed cycle is logged and retried next tick
    * (transient source/sink hiccups shouldn't kill a long-running
    * poller), but `maxConsecutiveFailures` failures IN A ROW rethrow the
    * last error — a persistently broken pipeline must crash loudly, not
    * tick forever while the sink quietly stops advancing. [[healthy]] /
    * [[consecutiveFailures]] expose the state between ticks. */
  def runPolling(
      intervalSeconds: Long = 300,
      maxCycles: Int = Int.MaxValue,
      maxConsecutiveFailures: Int = 3): Unit = {
    var i = 0
    while (i < maxCycles) {
      try { runSyncCycle(); consecutiveFailuresVar = 0 }
      catch {
        case e: Exception =>
          consecutiveFailuresVar += 1
          System.err.println(
            s"[engine] cycle failed ($consecutiveFailuresVar consecutive): ${e.getMessage}")
          if (consecutiveFailuresVar >= maxConsecutiveFailures) throw e
      }
      i += 1
      if (i < maxCycles) Thread.sleep(intervalSeconds * 1000)
    }
  }

  /** The made-real read path: embed a text query (F8), cosine top-k over
    * one namespace of the vector sink (`service_layer/service.py:166`).
    *
    * The scan is partition-pruned twice: the namespace filter prunes to
    * that namespace's directories, and — because the sink is sub-partitioned
    * by the embedding's sign-bucket (`Cdc.SimBits`) — the probe's
    * multi-probe bucket list prunes to `nprobe`/2^SimBits of the namespace
    * instead of scanning all of it. That locality pruning is the whole
    * point of a vector index at scale: Pinecone never scans the full
    * namespace per query, and neither does this.
    *
    * The default `nprobe = 0` is an EXACT full-namespace scan (recall 1,
    * cost O(namespace)) — approximation is opt-in, not silent. Passing
    * `nprobe > 0` prunes to that many multi-probe sign buckets (recall < 1
    * by LSH construction, rising with nprobe up to 2^SimBits = a full
    * scan); rows with simb = -1 (null or shorter-than-SimBits embeddings)
    * are always included so they never become unreachable. */
  def searchSimilar(
      query: String,
      k: Int = 10,
      namespace: String = Cdc.DefaultNamespace,
      nprobe: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.col
    val probe = Embeddings.embed(query)
    // manifest-pruned snapshot read: only this namespace's directories
    // are even listed, and no lock is taken (see commitLock scaladoc)
    val ns = Cdc.readVectorSink(spark, sinkDir, Some(namespace))
    val pruned =
      if (nprobe <= 0) ns
      else {
        val simBits = Cdc.readLayout(sinkDir).simBits // the sink's own layout
        val buckets =
          (SimilaritySearch.multiProbeBuckets(probe, simBits, nprobe).map(_.toInt) :+ -1).distinct
        // isNull: rows from a pre-simb sink read back with simb = NULL,
        // which `isin` never matches (three-valued logic) — without this
        // an ANN search over a legacy sink silently returns nothing
        ns.where(col("simb").isin(buckets: _*) || col("simb").isNull)
      }
    SimilaritySearch.topK(pruned, "id", "embedding",
      org.apache.spark.sql.functions.lit(probe).cast("array<float>"), k)
  }

  /** Batch form of [[searchSimilar]]: top-k for EVERY query string in one
    * distributed plan (no driver-side loop over queries). The tiny probe
    * side broadcasts; candidates are restricted to each probe's sign
    * bucket via the bucketed kNN join. Returns (query, rank, id, score). */
  def searchSimilarBatch(
      queries: Seq[String],
      k: Int = 10,
      namespace: String = Cdc.DefaultNamespace): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val simBits = Cdc.readLayout(sinkDir).simBits
    val probes = queries.map(q => (q, Embeddings.embed(q))).toDF("query", "probe_emb")
    val ns = Cdc.readVectorSink(spark, sinkDir, Some(namespace))
    SimilaritySearch.knnJoin(ns, probes, "id", "embedding", "query", "probe_emb",
      k, bits = simBits, broadcastProbes = true)
      .select(col("probe_id").as("query"), col("rank"), col("index_id").as("id"), col("score"))
  }

  /** Conventional location for a namespace's persisted IVF index: an
    * underscore-prefixed sibling INSIDE the sink directory, so the index
    * travels with the data it indexes. Spark's file index ignores `_`- and
    * `.`-prefixed paths, so sink reads never see it.
    *
    * The directory is a VERSIONED container (`v000001`, `v000002`, …
    * behind a `current` pointer): [[refreshIvfIndex]] builds the next
    * version beside the live one and flips the pointer atomically, so a
    * rebuild never races an in-flight query (the r12 in-place rebuild had
    * a TOCTOU window between the completeness check and the data read).
    * A pre-versioning index (centroids/data directly here) stays
    * readable. */
  def ivfIndexDir(namespace: String = Cdc.DefaultNamespace): String =
    s"$sinkDir/_ivf/$namespace"

  /** Directory holding a complete, readable index for the namespace:
    * the pointed version when the pointer exists (stale/crashed pointers
    * resolve to None rather than a broken read), else the legacy
    * unversioned layout if complete. */
  def liveIvfDir(namespace: String = Cdc.DefaultNamespace): Option[String] = {
    val container = new java.io.File(ivfIndexDir(namespace))
    def complete(d: java.io.File) =
      new java.io.File(d, "data/_SUCCESS").isFile &&
        new java.io.File(d, "centroids/_SUCCESS").isFile
    val ptr = new java.io.File(container, "current")
    if (ptr.isFile) {
      val v = new java.io.File(container, java.nio.file.Files.readString(ptr.toPath).trim)
      if (complete(v)) Some(v.getPath) else None
    } else if (complete(container)) Some(container.getPath)
    else None
  }

  /** True when a complete index exists for the namespace. */
  def hasIvfIndex(namespace: String = Cdc.DefaultNamespace): Boolean =
    liveIvfDir(namespace).isDefined

  /** Build a persisted IVF index over one namespace of the vector sink
    * (see [[graft.operators.IvfIndex]]): centroids adapt to the corpus,
    * unlike the sink's fixed sign-bucket locality — the better read path
    * once the namespace is large and clustered. For the conventional
    * serving location, use [[refreshIvfIndex]] — it versions the build
    * and flips the `/query` default atomically. */
  def buildIvfIndex(
      indexDir: String,
      k: Int = 16,
      iters: Int = 3,
      namespace: String = Cdc.DefaultNamespace,
      sampleFraction: Double = 1.0): Unit = {
    import org.apache.spark.sql.functions.col
    val ns = Cdc.readVectorSink(spark, sinkDir, Some(namespace))
      .where(col("embedding").isNotNull)
      .select(col("id"), col("embedding"))
    graft.operators.IvfIndex.build(ns, "id", "embedding", indexDir, k, iters, sampleFraction)
  }

  /** (Re)build the conventional index from the CURRENT sink snapshot and
    * publish it atomically: build into the next `vNNNNNN` version dir —
    * queries keep serving the live version throughout — then flip the
    * `current` pointer and GC every version but the new and previous one
    * (an in-flight query one flip behind still materializes its scan;
    * the same one-behind retention every store here uses). Build
    * parameters persist beside the data so an [[autoRefreshIvf]] refresh
    * reuses the live version's k/iters/sample rather than resetting to
    * defaults. */
  def refreshIvfIndex(
      namespace: String = Cdc.DefaultNamespace,
      k: Int = 16,
      iters: Int = 3,
      sampleFraction: Double = 1.0): Unit = {
    val container = new java.io.File(ivfIndexDir(namespace))
    container.mkdirs()
    // inherit the live version's persisted build params unless overridden
    val params = liveIvfDir(namespace)
      .map(d => new java.io.File(d, "_build.properties")).filter(_.isFile)
      .map { f =>
        val src = scala.io.Source.fromFile(f)
        try src.getLines().flatMap(_.split("=", 2) match {
          case Array(a, b) => Some(a.trim -> b.trim); case _ => None
        }).toMap finally src.close()
      }.getOrElse(Map.empty)
    val (kEff, itersEff, sampleEff) = (
      params.get("k").map(_.toInt).getOrElse(k),
      params.get("iters").map(_.toInt).getOrElse(iters),
      params.get("sampleFraction").map(_.toDouble).getOrElse(sampleFraction))
    val versions = Option(container.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches("v\\d{6}"))
      .sortBy(_.getName)
    val next = new java.io.File(container,
      f"v${versions.lastOption.map(_.getName.stripPrefix("v").toInt).getOrElse(0) + 1}%06d")
    buildIvfIndex(next.getPath, kEff, itersEff, namespace, sampleEff)
    val pw = new java.io.FileWriter(new java.io.File(next, "_build.properties"))
    try pw.write(s"k=$kEff\niters=$itersEff\nsampleFraction=$sampleEff\n") finally pw.close()
    val prevLive = liveIvfDir(namespace).map(p => new java.io.File(p).getName)
    val tmp = java.nio.file.Paths.get(container.getPath, "current_tmp")
    java.nio.file.Files.writeString(tmp, next.getName)
    java.nio.file.Files.move(tmp, new java.io.File(container, "current").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val keep = Set(next.getName) ++ prevLive
    versions.filterNot(v => keep(v.getName)).foreach(Engine.deleteRecursively)
    // legacy unversioned halves are shadowed by the pointer now
    Engine.deleteRecursively(new java.io.File(container, "data"))
    Engine.deleteRecursively(new java.io.File(container, "centroids"))
  }

  /** Text query against a persisted IVF index: `indexDir` may be a direct
    * build ([[buildIvfIndex]]) or a versioned container
    * ([[refreshIvfIndex]]) — a `current` pointer, when present, resolves
    * to the live version at call time. */
  def searchIvf(indexDir: String, query: String, k: Int = 10, nprobe: Int = 2): DataFrame = {
    val ptr = new java.io.File(indexDir, "current")
    val resolved =
      if (ptr.isFile) new java.io.File(indexDir, java.nio.file.Files.readString(ptr.toPath).trim).getPath
      else indexDir
    graft.operators.IvfIndex.search(spark, resolved, Embeddings.embed(query), k, nprobe)
  }

  /** Maintenance inputs of the namespace's live IVF index (VERDICT r17
    * task 7): the staleness clock, the per-cluster stale report, and the
    * [[graft.operators.IvfIndex.maintain]] chooser's pick — previously
    * stderr prints and return values only; surfaced so a fleet operator
    * (or the `/ivf/status` route) can act on the advisory instead of
    * tailing logs. Driver-side file reads plus one bounded centroid
    * collect — no data scan. */
  def ivfStatus(namespace: String = Cdc.DefaultNamespace): Engine.IvfStatus =
    liveIvfDir(namespace) match {
      case None =>
        Engine.IvfStatus(exists = false, None, 0, Double.NaN, Seq.empty, "none")
      case Some(dir) =>
        import graft.operators.IvfIndex
        val k = IvfIndex.centroidEntries(spark, dir).size
        val frac = IvfIndex.appendedFraction(dir)
        val stale = IvfIndex.staleClusters(dir)
        val advice = // exactly IvfIndex.maintain's decision, not applied
          if (stale.isEmpty) "none"
          else if (k > 0 &&
            stale.size.toDouble / k >= IvfIndex.DefaultRebuildClusterShare) "rebuild"
          else "repair"
        Engine.IvfStatus(exists = true, Some(dir), k, frac, stale, advice)
    }

  /** `describe_index_stats` analog (`service_layer/service.py:97`). */
  def indexStats(): DataFrame = Cdc.sinkStats(spark, sinkDir)

  /** Current per-table watermarks (the reference's `watermark` table). */
  def watermarks(): DataFrame = Cdc.readWatermarks(spark, stateDir)

  /** One-time split of the watermark store into `shards` hash shards —
    * for fleets past ~10k hot CDC tables through one store, where the
    * single file's O(T) rewrite-per-commit runs out of budget (measured
    * knee: ~60 ms/commit at 10k tables, ~260 ms at 100k — BASELINE.md /
    * graft.WmProbe). Commits drop to O(T/B) and stop serializing across
    * shards; every read surface is unchanged. */
  def shardWatermarkStore(shards: Int): Unit = Cdc.shardWatermarkStore(stateDir, shards)
}

object Engine {

  /** One namespace's IVF maintenance snapshot ([[Engine.ivfStatus]]):
    * `advice` is the [[graft.operators.IvfIndex.maintain]] chooser's
    * pick ("none" / "repair" / "rebuild"), reported, not applied. */
  final case class IvfStatus(
      exists: Boolean,
      dir: Option[String],
      centroids: Int,
      appendedFraction: Double,
      staleClusters: Seq[graft.operators.IvfIndex.ClusterStaleness],
      advice: String)

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
