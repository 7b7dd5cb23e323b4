package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffling — training-order randomization for a
  * corpus WITHOUT rand(): the order key is a portable hash of
  * (epoch salt, doc id), so the permutation is reproducible across runs,
  * partitionings, and engines, and a new salt reshuffles the next epoch.
  * The reference has no ordering story at all (Pinecone upsert order is
  * arrival order); every large-scale training pipeline needs one.
  *
  * Scale shape: assigning explicit GLOBAL positions is the classic
  * distributed-index problem. The naive `row_number() OVER (ORDER BY k)`
  * is an unpartitioned window — Spark moves the whole corpus into ONE
  * task (its own "No Partition Defined" warning; the 100 TB killer).
  * [[globalOrderIndex]] instead:
  *  1. assigns each row a BLOCK id derived arithmetically from its key
  *     (proportional split of the 32-bit hash range — deterministic,
  *     no sampling; hash-uniform keys ⇒ balanced blocks),
  *  2. takes per-block row_numbers (block-partitioned windows), and
  *  3. joins broadcast per-block offsets (a ≤ `parts`-row exclusive
  *     prefix sum — tiny by construction, like IVF centroids).
  * Total order and the oracle's global row_number agree exactly because
  * the block id is monotone in the key. */
object EpochShuffle {

  /** Reproducible per-epoch order key (32-bit portable hash). */
  def shuffleKey(epochSalt: String, id: Column): Column =
    PortableHash.hash32(concat(lit(epochSalt + ":"), id.cast("string")))

  /** 1-based global position of every row under `ORDER BY key, tieBreak`,
    * computed with key-derived blocks + partition-local windows +
    * broadcast offsets (never a single-partition window).
    *
    * `key` MUST be a non-negative value < 2³² (e.g. [[shuffleKey]]'s
    * 32-bit portable hash) and (key, tieBreak) unique per row. The block
    * id is `⌊key · parts / 2³²⌋` — a PURE FUNCTION of the key, monotone
    * in it, and balanced because hash keys are uniform in [0, 2³²).
    * This replaces the earlier sampled `repartitionByRange` +
    * `spark_partition_id()` + eager `localCheckpoint(true)` design: the
    * checkpoint pinned partition-id stability by storing the whole
    * corpus in executor block-manager memory with TRUNCATED lineage (an
    * executor loss made the job unrecoverable, and at scale the cached
    * corpus was a memory tax), and Spark's range sampling itself seeds
    * from the RDD id, so pid stability across separate recomputes was
    * exchange-reuse-dependent rather than guaranteed. A key-derived
    * block id needs no storage and is identical under ANY recompute, so
    * correctness never depends on which physical partition computed a
    * row. Per-block offsets are an exclusive prefix sum over the
    * ≤`parts`-row count relation, built with a broadcast triangular
    * join — in-plan, driver-free, and never a single-partition window. */
  def globalOrderIndex(
      df: DataFrame,
      key: Column,
      tieBreak: Column,
      posName: String,
      parts: Int = 32): DataFrame = {
    val keyed = df
      .withColumn("_k", key)
      .withColumn("_pid", shiftright(col("_k").cast("long") * lit(parts.toLong), 32).cast("int"))
    // exclusive prefix sum of per-block counts: ≤ `parts` rows total, so
    // the triangular broadcast join is nil-cost and stays distributed
    val counts = keyed.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
    val prior = counts.select(col("_pid").as("_pid_lt"), col("_n").as("_n_lt"))
    val offs = counts.join(broadcast(prior), col("_pid_lt") < col("_pid"), "left_outer")
      .groupBy(col("_pid")).agg(coalesce(sum(col("_n_lt")), lit(0L)).as("_off"))
    val w = Window.partitionBy(col("_pid")).orderBy(col("_k"), tieBreak)
    keyed.join(broadcast(offs), Seq("_pid"))
      .withColumn(posName, (row_number().over(w).cast("long") + col("_off")))
      .drop("_pid", "_off", "_k")
  }
}
