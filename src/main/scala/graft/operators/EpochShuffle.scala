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
  *  1. range-partitions by the key (the same exchange a global sort
  *     plans; hash-uniform keys ⇒ balanced partitions),
  *  2. sorts within partitions and takes per-partition row_numbers
  *     (partition-local windows), and
  *  3. joins broadcast per-partition offsets (a ≤ `parts`-row cumulative
  *     count — driver-tiny by construction, like IVF centroids).
  * Total order and the oracle's global row_number agree exactly because
  * range partitioning puts key-ordered blocks on ordered partition ids. */
object EpochShuffle {

  /** Reproducible per-epoch order key (32-bit portable hash). */
  def shuffleKey(epochSalt: String, id: Column): Column =
    PortableHash.hash32(concat(lit(epochSalt + ":"), id.cast("string")))

  /** 1-based global position of every row under `ORDER BY key, tieBreak`,
    * computed with range partitioning + partition-local windows +
    * broadcast offsets (never a single-partition window). Deterministic:
    * repartitionByRange samples with a fixed seed, and (key, tieBreak)
    * must be unique per row (a doc id tie-break makes it so). */
  def globalOrderIndex(
      df: DataFrame,
      key: Column,
      tieBreak: Column,
      posName: String,
      parts: Int = 32): DataFrame = {
    val keyed = df
      .withColumn("_k", key)
      .repartitionByRange(parts, col("_k"), tieBreak)
      .sortWithinPartitions(col("_k"), tieBreak)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // pid-stable input for both the counts and the window
    // cumulative partition offsets: ≤ `parts` rows on the driver
    val counts = keyed.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    val offByPid = counts.map(_._1).zip(offsets.map(_._2)).toMap
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offByPid.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(col("_k"), tieBreak)
    keyed.join(broadcast(offDf), Seq("_pid"))
      .withColumn(posName, (row_number().over(w).cast("long") + col("_off")))
      .drop("_pid", "_off", "_k")
  }
}
