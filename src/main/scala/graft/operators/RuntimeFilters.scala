package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Broadcast Bloom-filter runtime pruning — the standard 100 TB shape for
  * a big-probe/small-build semi-join whose build side is too large to
  * broadcast as a hash relation but whose MEMBERSHIP fits in a few
  * megabits.
  *
  * Why this exists: a semi-join ships every probe-side row (here: every
  * shingle of a 100 TB training corpus) through a shuffle to meet the
  * build side. A Bloom filter of the build keys, applied as a Filter
  * BEFORE the exchange, drops the overwhelming majority of probe rows at
  * the scan side for the cost of a literal byte array in the task binary —
  * shuffle volume falls from O(probe rows) to O(matches + fpp·probe rows).
  * Spark's own runtime row-level filtering injects exactly this plan
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) but only for equi-joins
  * it can see through; this operator makes the same rewrite available
  * explicitly, with the filter's size/fpp chosen by the caller who knows
  * the key cardinality.
  *
  * Correctness contract: a Bloom filter has NO false negatives, so
  * `prefilter → exact semi-join` returns byte-identical results to the
  * plain semi-join (false positives are removed by the exact join). The
  * DuckDB oracle therefore checks the bloom-pruned query with ordinary
  * ANSI semi-join SQL — the filter is invisible to semantics by
  * construction (RuntimeFilterSpec asserts the equality and the pruning).
  *
  * Mechanics: the filter is built distributed (`df.stat.bloomFilter` is a
  * treeAggregate — executors build partial filters, the driver ORs them),
  * then embedded as a foldable Binary literal probed by Spark's codegen
  * [[BloomFilterMightContain]] (deserialized once per task, not per row).
  * Keys are normalized to LONG on both build and probe (`putLong` /
  * `mightContainLong` are the matching sketch pair).
  */
object RuntimeFilters {

  /** Distributed-build a Bloom filter over `keys.col(keyCol)` (cast to
    * long) and return its serialized form. `expectedItems` should
    * over-estimate the DISTINCT key count (an undersized filter degrades
    * fpp, never correctness); at fpp=0.03 the filter costs ~7.3 bits/key
    * — 10⁸ keys ≈ 91 MB, 10⁶ ≈ 0.9 MB. */
  def bloomBytes(keys: DataFrame, keyCol: String, expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val bf = keys.select(col(keyCol).cast(LongType).as(keyCol)).stat
      .bloomFilter(keyCol, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen membership probe against a serialized filter: true / false /
    * null-for-null-key, no false negatives. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      ColumnBridge.expression(key.cast(LongType))))

  /** `big SEMI JOIN small ON key`, with the big side Bloom-pruned before
    * the join's exchange. Exact: equals the plain semi-join. */
  def bloomPrunedSemiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long,
      fpp: Double = 0.03): DataFrame = {
    val bytes = bloomBytes(small.select(key), key, expectedItems, fpp)
    big.where(mightContain(bytes, col(key)))
      .join(small.select(key).distinct(), Seq(key), "left_semi")
  }
}
