package graft.operators

import graft.functions.{Embeddings, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column — the read path the reference
  * delegates to Pinecone (§3.3: `embed_query`, `utils/embeddings_utils.py:
  * 10-14`; cosine metric, `service_layer/service.py:91`; the
  * `PineconeVectorStore` import at `service_layer/service.py:3` that no
  * route ever reaches). The engine makes it a real, runnable query.
  *
  * Scale design:
  *  - [[topK]] (brute force): one scan, cosine in codegen'd column exprs,
  *    top-k via per-partition limit + global merge (`orderBy.limit(k)` —
  *    Spark plans TakeOrderedAndProject: no global sort materialization).
  *    This is the exact baseline: O(n·d) once, embarrassingly parallel.
  *  - [[topKByBuckets]] (ANN): sign-bucket LSH restricts the scan to the
  *    probe's bucket (≈ n/2^bits candidates); with bucketed/partitioned
  *    storage on `bucket` this becomes partition pruning — the 100 TB path.
  *  - [[knnJoin]]: many probes at once — join on bucket, then windowed
  *    rank ≤ k per probe; no driver-side loop over probes.
  */
object SimilaritySearch {

  /** Exact brute-force top-k by cosine against one probe vector. */
  def topK(index: DataFrame, idCol: String, vecCol: String, probe: Column, k: Int): DataFrame =
    index
      .select(col(idCol), round(VectorOps.cosineFast(col(vecCol), probe), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** Exact top-k for a text query: embed (F8) then [[topK]]. */
  def topKText(index: DataFrame, idCol: String, vecCol: String, query: String, k: Int): DataFrame =
    topK(index, idCol, vecCol, Embeddings.embedQueryCol(query), k)

  /** The probe's sign bucket plus the `nprobe - 1` next-most-likely
    * buckets (multi-probe LSH, Lv et al. 2007): a vector lands on the
    * other side of hyperplane i most easily where |component i| is
    * smallest, so the best extra probes flip the lowest-|magnitude| bits.
    * Deterministic, driver-side, O(bits log bits). */
  def multiProbeBuckets(probe: Array[Float], bits: Int, nprobe: Int): Seq[Long] = {
    var base = 0L
    (0 until bits).foreach(i => if (probe(i) > 0f) base |= (1L << i))
    val flipOrder = (0 until bits).sortBy(i => math.abs(probe(i).toDouble))
    base +: flipOrder.take(math.max(nprobe - 1, 0)).map(i => base ^ (1L << i))
  }

  /** ANN top-k: only vectors in the probe's sign-bucket(s) are scored. With
    * the index pre-partitioned by bucket, non-matching partitions are
    * pruned at the scan. Recall < 1 by construction; raise recall by
    * lowering `bits` or raising `nprobe` (multi-probe neighbors — see
    * [[multiProbeBuckets]]). */
  def topKByBuckets(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Array[Float],
      k: Int,
      bits: Int = 8,
      nprobe: Int = 1): DataFrame = {
    val buckets = multiProbeBuckets(probe, bits, nprobe)
    index
      .withColumn("_bucket", VectorOps.signBucket(col(vecCol), bits))
      .where(col("_bucket").isin(buckets: _*))
      .select(col(idCol), round(VectorOps.cosineFast(col(vecCol), lit(probe).cast("array<float>")), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  // --- IVF (inverted-file) ANN ------------------------------------------

  /** Coarse quantizer: deterministic Lloyd k-means over the index vectors.
    * Seeded with the first k vectors by id (deterministic, no RNG — RNG
    * seeds don't reproduce across partitionings), refined `iters` times.
    * Model state is k·dim floats — driver-resident by design, like any
    * ANN index's coarse centroids.
    *
    * The centroid update is DISTRIBUTED: posexplode each vector to
    * (cluster, dim, x) and mean per (cluster, dim). Partial aggregation
    * collapses every partition to ≤ k·dim rows map-side, so both the
    * shuffle and the driver collect carry only the k×dim centroid matrix
    * — never the index itself (the previous formulation collected every
    * member vector per iteration, a guaranteed driver OOM at scale).
    * `sampleFraction` < 1 trains on a seeded sample — at 100 TB a small
    * sample gives statistically identical coarse centroids for a fraction
    * of the assignment cost. */
  def ivfTrain(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 3,
      sampleFraction: Double = 1.0): Array[Array[Float]] = {
    val spark = index.sparkSession
    import spark.implicits._
    val train =
      if (sampleFraction < 1.0) index.sample(withReplacement = false, sampleFraction, seed = 42L)
      else index
    var centroids: Array[Array[Float]] = index
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).as[Array[Float]].collect()
    for (_ <- 0 until iters) {
      val assigned = train.select(
        nearestCentroid(col(vecCol), centroids).as("cluster"),
        col(vecCol).as("v"))
      val updated: Map[Int, Array[Float]] = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .as[(Int, Seq[(Int, Double)])]
        .collect() // k rows × dim doubles — the centroid matrix, nothing more
        .map { case (cid, dims) => cid -> dims.map(_._2.toFloat).toArray }
        .toMap
      // a cluster that lost all members keeps its previous centroid
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Index of the closest centroid by cosine (ties → lowest index): sort
    * (score, -index) structs ascending, take the last. */
  private def nearestCentroid(v: Column, centroids: Array[Array[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.cosineFast(v, lit(c).cast("array<float>")).as("s"), lit(-i).as("ni"))
    }
    element_at(array_sort(array(scored: _*)), -1).getField("ni") * lit(-1)
  }

  /** IVF ANN top-k: assign every index vector to its nearest coarse
    * centroid (this becomes the partitioning/bucketing key at scale —
    * partition pruning replaces the full scan), then score only the
    * `nprobe` clusters nearest to the probe. Recall rises with nprobe. */
  def ivfTopK(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Float]],
      probe: Array[Float],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); sa += a(i).toDouble * a(i); sb += b(i).toDouble * b(i); i += 1 }
      val d = math.sqrt(sa) * math.sqrt(sb)
      if (d == 0.0) 0.0 else dot / d
    }
    val probeClusters = centroids.zipWithIndex
      .map { case (c, i) => (cos(c, probe), i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(nprobe).map(_._2)
    index
      .withColumn("_cluster", nearestCentroid(col(vecCol), centroids))
      .where(col("_cluster").isin(probeClusters.toSeq: _*))
      .select(col(idCol), round(VectorOps.cosineFast(col(vecCol), lit(probe).cast("array<float>")), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Batch kNN join: top-k index neighbors for EVERY probe row, bucketed so
    * each probe only meets its bucket's vectors.
    *
    * `broadcastProbes = true` hints the probe side into a broadcast join —
    * correct ONLY when probes are genuinely small (a query batch). For
    * probe sets of index scale (self-kNN over a corpus), pass false: both
    * sides then shuffle-partition on `_bucket` (AQE still upgrades to
    * broadcast at runtime if the probe side turns out under the
    * threshold) — an unconditional broadcast of a corpus-sized probe side
    * is a driver/executor OOM at 100 TB. */
  def knnJoin(
      index: DataFrame,
      probes: DataFrame,
      indexId: String,
      indexVec: String,
      probeId: String,
      probeVec: String,
      k: Int,
      bits: Int = 8,
      broadcastProbes: Boolean = true): DataFrame = {
    val idx = index.select(
      col(indexId).as("index_id"),
      col(indexVec).as("_iv"),
      VectorOps.signBucket(col(indexVec), bits).as("_bucket"))
    val prb = probes.select(
      col(probeId).as("probe_id"),
      col(probeVec).as("_pv"),
      VectorOps.signBucket(col(probeVec), bits).as("_bucket"))
    val scored = idx
      .join(if (broadcastProbes) broadcast(prb) else prb, Seq("_bucket"))
      .select(
        col("probe_id"),
        col("index_id"),
        round(VectorOps.cosineFast(col("_iv"), col("_pv")), 6).as("score"))
    val w = Window.partitionBy(col("probe_id")).orderBy(desc("score"), col("index_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
