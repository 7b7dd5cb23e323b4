package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics at data-proportional parallelism.
  *
  * The naive plan — `row_number() OVER (PARTITION BY group ORDER BY v)`
  * — is a full sort of every group at parallelism = #distinct groups; with
  * ~3 groups (q95's `l_returnflag`) that is three single-task sorts of the
  * whole fact table at ANY scale, the 100 TB killer. This operator picks
  * the same order statistics with bounded per-task work, the
  * [[EpochShuffle.globalOrderIndex]] pattern adapted to a non-uniform
  * value domain:
  *
  *  1. one map-side-combining aggregate gets per-group (min, max, n);
  *  2. each row gets a BLOCK id derived arithmetically from its value —
  *     `⌊(v−min)/(max−min)·parts⌋`, a pure monotone function of the value
  *     (no sampling, no `spark_partition_id()`), so equal values share a
  *     block and sorted-block concatenation IS the group's sorted order,
  *     identical under any recompute;
  *  3. per-(group, block) counts (≤ groups·parts rows) turn into exclusive
  *     prefix-sum offsets via a broadcast triangular join — in-plan,
  *     driver-free;
  *  4. only the blocks that CONTAIN a requested rank survive a broadcast
  *     semi-filter, so the final `row_number` window sorts ≤ |ranks|
  *     blocks of ~n/parts rows each, never a whole group.
  *
  * Rank arithmetic is exact regardless of tie order inside a block: the
  * value at global rank r is the r-th smallest of the multiset, which no
  * permutation of equal values can change.
  *
  * Preconditions: `value` is numeric, non-null, non-NaN (casts to double
  * monotonically — block ids only need monotone non-decreasing, so
  * decimal→double tie-merging is harmless). The preconditions are
  * ENFORCED in-plan: a null or NaN value would make `_blk` null, the
  * block join would silently drop the row, and every downstream rank
  * would shift — a wrong answer, not an error — so the scan raises
  * loudly (`raise_error`) on the first violating row instead. Block
  * balance follows the value distribution; a pathologically-skewed
  * domain degrades toward one block = one group, never below the naive
  * plan's parallelism.
  */
object RankStats {

  /** Rows of `df` at the requested per-group 1-based ranks under
    * `ORDER BY value` ascending within each group. `ranksOfN` maps the
    * group's row count to the wanted rank expressions (longs in [1, n];
    * duplicates are de-duplicated). Returns one row per distinct
    * (group, rank): columns (`group`, `_rank`, `value`). */
  def atRanks(
      df: DataFrame,
      group: String,
      value: String,
      ranksOfN: Column => Seq[Column],
      parts: Int = 32): DataFrame = {
    val g = col(group)
    val rawV = col(value)
    // precondition guard (scaladoc): null/NaN must fail loudly, never
    // silently shift ranks. raise_error is NullType, which coerces into
    // the value column's type, so the when() keeps the original schema.
    val rows = df.select(g,
      when(rawV.isNull || isnan(rawV.cast("double")),
        raise_error(concat(
          lit(s"RankStats.atRanks: null/NaN in value column '$value' for group "),
          g.cast("string"))))
        .otherwise(rawV).as(value))
    val v = col(value)
    val stats = rows.groupBy(g).agg(
      min(v).cast("double").as("_vmin"),
      max(v).cast("double").as("_vmax"),
      count(lit(1)).as("_n"))
    val blocked = rows
      .join(broadcast(stats.select(g, col("_vmin"), col("_vmax"))), Seq(group))
      .withColumn("_blk",
        when(col("_vmax") <= col("_vmin"), lit(0))
          .otherwise(least(lit(parts - 1), greatest(lit(0),
            floor((v.cast("double") - col("_vmin")) /
              (col("_vmax") - col("_vmin")) * parts).cast("int")))))
      .select(g, v, col("_blk"))
    val counts = blocked.groupBy(g, col("_blk")).agg(count(lit(1)).as("_c"))
    // exclusive prefix sum over the tiny counts relation (groups·parts
    // rows max) — broadcast triangular join, same shape as EpochShuffle
    val prior = counts.select(
      g.as("_g_lt"), col("_blk").as("_blk_lt"), col("_c").as("_c_lt"))
    val offs = counts
      .join(broadcast(prior),
        g === col("_g_lt") && col("_blk_lt") < col("_blk"), "left_outer")
      .groupBy(g, col("_blk"), col("_c"))
      .agg(coalesce(sum(col("_c_lt")), lit(0L)).as("_off"))
    val targets = stats
      .select(g.as("_g_t"),
        explode(array_distinct(array(ranksOfN(col("_n")): _*))).as("_rank"))
    // the block containing rank r is the one with _off < r <= _off + _c
    val needed = offs
      .join(broadcast(targets),
        g === col("_g_t") && col("_rank") > col("_off") &&
          col("_rank") <= col("_off") + col("_c"))
      .select(g, col("_blk"), col("_off")).distinct()
    val w = Window.partitionBy(g, col("_blk")).orderBy(v)
    blocked
      .join(broadcast(needed), Seq(group, "_blk"))
      .withColumn("_grank", row_number().over(w).cast("long") + col("_off"))
      .join(broadcast(targets),
        g === col("_g_t") && col("_grank") === col("_rank"))
      .select(g, col("_rank"), v)
  }
}
