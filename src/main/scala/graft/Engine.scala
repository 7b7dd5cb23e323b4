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
    layout: Cdc.SinkLayout = Cdc.DefaultLayout) { // applies only when the sink is created

  /** S8: create the vector sink if absent. */
  def initializeIndex(): Unit = Cdc.initVectorSink(spark, sinkDir, layout)

  /** Serializes this engine's sink swaps + watermark commits with any
    * reader that wants a swap-free window: every cycle's commit section
    * runs under it, and [[ServeHttp]] holds it around each store-reading
    * route, so an HTTP read can never observe (or race the GC of) a
    * mid-swap store version. Commits are small by design — chunk+embed
    * materializes OUTSIDE the lock — so read-side contention is bounded
    * by the swap, not the cycle. */
  val commitLock = new Object

  /** One CDC sync tick over every source table. Returns rows synced. */
  def runSyncCycle(): Map[String, Long] =
    Cdc.syncCycle(spark, sourceDir, stateDir, sinkDir, changeCol,
      chunkSize = chunkSize, layout = layout, commitLock = commitLock)

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
    val ns = Cdc.readVectorSink(spark, sinkDir).where(col("namespace") === namespace)
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
    val ns = Cdc.readVectorSink(spark, sinkDir).where(col("namespace") === namespace)
    SimilaritySearch.knnJoin(ns, probes, "id", "embedding", "query", "probe_emb",
      k, bits = simBits, broadcastProbes = true)
      .select(col("probe_id").as("query"), col("rank"), col("index_id").as("id"), col("score"))
  }

  /** Conventional location for a namespace's persisted IVF index: an
    * underscore-prefixed sibling INSIDE the sink directory, so the index
    * travels with the data it indexes. Spark's file index ignores `_`- and
    * `.`-prefixed paths, so sink reads never see it. */
  def ivfIndexDir(namespace: String = Cdc.DefaultNamespace): String =
    s"$sinkDir/_ivf/$namespace"

  /** True when a COMPLETE index exists at [[ivfIndexDir]] — both parquet
    * halves committed (`_SUCCESS` markers), so a crash mid-build never
    * reads as an index. */
  def hasIvfIndex(namespace: String = Cdc.DefaultNamespace): Boolean = {
    val d = new java.io.File(ivfIndexDir(namespace))
    new java.io.File(d, "data/_SUCCESS").isFile &&
      new java.io.File(d, "centroids/_SUCCESS").isFile
  }

  /** Build a persisted IVF index over one namespace of the vector sink
    * (see [[graft.operators.IvfIndex]]): centroids adapt to the corpus,
    * unlike the sink's fixed sign-bucket locality — the better read path
    * once the namespace is large and clustered. Build at [[ivfIndexDir]]
    * to make it the [[ServeHttp]] `/query` default. */
  def buildIvfIndex(
      indexDir: String,
      k: Int = 16,
      iters: Int = 3,
      namespace: String = Cdc.DefaultNamespace,
      sampleFraction: Double = 1.0): Unit = {
    import org.apache.spark.sql.functions.col
    val ns = Cdc.readVectorSink(spark, sinkDir)
      .where(col("namespace") === namespace && col("embedding").isNotNull)
      .select(col("id"), col("embedding"))
    graft.operators.IvfIndex.build(ns, "id", "embedding", indexDir, k, iters, sampleFraction)
  }

  /** Text query against a persisted IVF index built by [[buildIvfIndex]]. */
  def searchIvf(indexDir: String, query: String, k: Int = 10, nprobe: Int = 2): DataFrame =
    graft.operators.IvfIndex.search(spark, indexDir, Embeddings.embed(query), k, nprobe)

  /** `describe_index_stats` analog (`service_layer/service.py:97`). */
  def indexStats(): DataFrame = Cdc.sinkStats(spark, sinkDir)

  /** Current per-table watermarks (the reference's `watermark` table). */
  def watermarks(): DataFrame = Cdc.readWatermarks(spark, stateDir)
}
