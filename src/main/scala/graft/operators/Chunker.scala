package graft.operators

import graft.functions.{JsonRows, PortableHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunk assembly (A2): rows → fixed-size documents.
  *
  * Reference: rows are JSON-serialized (`service_layer/service.py:117`),
  * grouped 100-at-a-time in arrival order, and space-joined into one
  * document per group, with a tail flush for the last partial chunk
  * (`service_layer/service.py:109-145`). Chunk ids there are fresh UUIDs
  * (`:126`, `:140`) — replaced here by content hashes for idempotence
  * (SURVEY §7).
  *
  * Two modes:
  *  - [[chunkDeterministic]]: a total order over an explicit key defines
  *    chunk membership — testable, oracle-checkable. Implemented as a
  *    DISTRIBUTED global numbering (key-derived blocks + per-block counts
  *    + broadcast offsets), NOT a single-partition `Window.orderBy`: same
  *    chunk boundaries, no one-executor bottleneck, no stored snapshot
  *    for numeric keys.
  *  - [[chunkScalable]]: partition-local chunk ids salted by
  *    `spark_partition_id` — no global ordering pass at all, arbitrary-but-
  *    deterministic-per-partition boundaries. The reference's own chunk
  *    boundaries are arbitrary arrival order (`SELECT *` with no ORDER BY,
  *    `service_layer/service.py:53-57`), so this matches its contract at
  *    any scale; content-hash ids keep the sink idempotent either way.
  */
object Chunker {

  val DefaultChunkSize = 100 // service_layer/service.py:109

  /** The reference space-joins docs into a chunk (service_layer/service.py:
    * 124-127) — kept as the default. Callers that later SPLIT the chunk
    * text back into docs should pass a separator that cannot occur in a
    * doc (e.g. [[UnitSep]]); a doc containing the separator makes the
    * reassembled text ambiguous. */
  val DefaultSep = " "

  /** ASCII unit separator: safe doc delimiter for JSON docs (control chars
    * are always escaped inside JSON strings, so it can never collide). */
  val UnitSep = "\u001F"

  /** Deterministic chunking: order by `orderCol` (callers should pass a
    * unique key — ties make chunk membership partition-order-dependent),
    * group rows into chunks of `chunkSize`, space-join `docCol` values in
    * order. Output: (chunk_no, id, source, text, n_rows).
    *
    * Global row numbers WITHOUT a single-partition window AND (for the
    * numeric keys every caller passes — CDC primary keys, event ids)
    * without storing anything: the [[EpochShuffle.globalOrderIndex]]
    * pattern generalized to an arbitrary numeric range. The block id is a
    * PURE, monotone function of the key — its proportional position
    * inside the exact [min, max] value range — so per-block row_numbers
    * plus broadcast per-block offsets reproduce the total order under ANY
    * recompute; correctness never depends on which physical partition
    * computed a row, no snapshot is taken, and the corpus is never pinned
    * in storage (the previous design cached the WHOLE indexed relation to
    * stabilize sampled range partitioning — at 100 TB that cache is a
    * straight memory/disk tax, and losing it mid-job lost the numbering).
    * Block balance tracks the key's value distribution (ids and
    * timestamps are near-uniform in practice); skew degrades balance,
    * never correctness, and the counts pass makes any imbalance visible
    * to AQE. Non-numeric keys (no monotone arithmetic mapping exists)
    * keep the sampled range partitioning, with the sampled outcome
    * captured ONCE in a RELIABLE snapshot ([[Materialize.truncate]]) —
    * durable against executor loss, unlike the previous local snapshot. */
  def chunkDeterministic(
      df: DataFrame,
      orderCol: Column,
      docCol: Column,
      source: String,
      chunkSize: Int = DefaultChunkSize,
      sep: String = DefaultSep): DataFrame = {
    val nPart = math.max(
      scala.util.Try(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .getOrElse(32), // non-numeric conf (e.g. "auto" in forks) → safe default
      1)
    val keyed = df.select(orderCol.as("_ord"), docCol.as("_doc"))
    val isNumericKey = keyed.schema("_ord").dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.DateType => true
      case _ => false
    }
    val blocked =
      if (isNumericKey) {
        // exact (min, max) — one tiny deterministic agg; the ONLY
        // driver-side value in the numeric path (2 doubles)
        val mm = keyed.agg(
          min(col("_ord").cast("double")).as("lo"),
          max(col("_ord").cast("double")).as("hi")).collect()(0)
        val bid =
          if (mm.isNullAt(0) || mm.getDouble(1) <= mm.getDouble(0))
            // empty input or single distinct key: one block
            when(col("_ord").isNotNull, lit(0)).otherwise(lit(-1))
          else {
            val lo = mm.getDouble(0)
            val span = mm.getDouble(1) - lo
            // double cast of any numeric is monotone (non-strict); floor
            // and clamp preserve it, so block id order == key order
            when(col("_ord").isNotNull,
              least(lit(nPart - 1), greatest(lit(0),
                floor((col("_ord").cast("double") - lit(lo)) / lit(span) * lit(nPart)).cast("int"))))
              .otherwise(lit(-1)) // SQL sort is NULLS FIRST: nulls get the lowest block
          }
        keyed.withColumn("_bid", bid)
      } else {
        // sampled range partitioning: two executions can bucket rows
        // differently, so the sampled outcome must be captured once —
        // reliably, so an executor loss re-reads the snapshot instead of
        // failing the job (and a recompute can never renumber rows)
        Materialize.truncate(keyed
          .repartitionByRange(nPart, col("_ord"))
          .withColumn("_bid", spark_partition_id()))
      }
    // per-block sizes: partial-aggregates map-side, so the counts pass
    // shuffles ~nPart rows — and in the numeric path Catalyst prunes
    // `_doc` from this branch entirely, so an expensive doc expression
    // (e.g. whole-row JSON) is only ever computed in the numbering branch
    val counts = blocked.groupBy(col("_bid")).agg(count(lit(1)).as("_cnt"))
    // exclusive prefix sum over the ≤ (nPart+1)-row counts relation via a
    // broadcast triangular join (block ids are monotone in the key, so
    // offset order == global order); in-plan, driver-free, and never a
    // single-partition window
    val prior = counts.select(col("_bid").as("_bid_lt"), col("_cnt").as("_cnt_lt"))
    val offsets = counts.join(broadcast(prior), col("_bid_lt") < col("_bid"), "left_outer")
      .groupBy(col("_bid")).agg(coalesce(sum(col("_cnt_lt")), lit(0L)).as("_off"))
    // per-block numbering: the window partitions on _bid, so no partition
    // ever holds more than one block's rows
    val wBlock = Window.partitionBy(col("_bid")).orderBy(col("_ord"), col("_doc"))
    val numbered = blocked
      .join(broadcast(offsets), Seq("_bid"))
      .withColumn("_rn", row_number().over(wBlock).cast("long") + col("_off"))
      .withColumn("_chunk_no", floor((col("_rn") - 1) / chunkSize))
      .select(col("_chunk_no"), col("_rn"), col("_doc"))
    assemble(numbered, source, sep)
  }

  /** Scalable chunking: chunk ids are (partition, local row index / size) —
    * zero global shuffle before the group-by, which then shuffles only
    * (chunk_key, doc) pairs. */
  def chunkScalable(
      df: DataFrame,
      docCol: Column,
      source: String,
      chunkSize: Int = DefaultChunkSize,
      sep: String = DefaultSep): DataFrame = {
    // Materialize partition id/row id BEFORE any exchange: evaluated lazily
    // inside the window's chunk-key expression they would see post-shuffle
    // partition ids and collide across groups.
    val tagged = df
      .withColumn("_pid", spark_partition_id().cast("long"))
      .withColumn("_mid", monotonically_increasing_id())
    val w = Window.partitionBy(col("_pid")).orderBy(col("_mid"))
    val numbered = tagged
      .withColumn("_rn", row_number().over(w))
      .withColumn("_chunk_no", col("_pid") * lit(1L << 33) + floor((col("_rn") - 1) / chunkSize))
      .select(col("_chunk_no"), col("_rn"), docCol.as("_doc"))
    assemble(numbered, source, sep)
  }

  /** Token-budget packing (the LLM-context-window action the count-based
    * modes approximate): docs are packed, in partition-local order, into
    * chunks whose cumulative token count spans one `budget` window —
    * chunk p holds the docs whose EXCLUSIVE token prefix sum lies in
    * [p·budget, (p+1)·budget), so a pack never exceeds budget by more
    * than its own last doc. Same zero-global-shuffle shape as
    * [[chunkScalable]]. */
  def packByTokenBudget(
      df: DataFrame,
      docCol: Column,
      tokenCount: Column,
      source: String,
      budget: Long,
      sep: String = DefaultSep): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val tagged = df
      .withColumn("_pid", spark_partition_id().cast("long"))
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_tok", tokenCount.cast("long"))
    val w = Window.partitionBy(col("_pid")).orderBy(col("_mid"))
    val numbered = tagged
      .withColumn("_rn", row_number().over(w))
      .withColumn("_cum", coalesce(
        sum(col("_tok")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_chunk_no", col("_pid") * lit(1L << 33) + floor(col("_cum") / budget))
      .select(col("_chunk_no"), col("_rn"), docCol.as("_doc"))
    assemble(numbered, source, sep)
  }

  /** Whole-row JSON chunking — the reference's exact pipeline stage:
    * serialize every column (F1 coercions) then chunk. */
  def chunkRowsAsJson(
      df: DataFrame,
      orderCol: Column,
      source: String,
      chunkSize: Int = DefaultChunkSize): DataFrame = {
    // spread BEFORE the JSON projection so it parallelizes past a
    // degenerate (single-row-group) scan; deterministic chunking is
    // partition-independent (key-derived blocks), so rows and chunk
    // membership are unchanged (Materialize.spreadNarrowScan — no-op at
    // scale). The projection sits ABOVE the spread exchange, so the
    // counts branch still prunes `_json` and the exchange ships raw rows.
    val spread = Materialize.spreadNarrowScan(df, orderCol)
    chunkDeterministic(spread.withColumn("_json", JsonRows.toJsonCol(spread)),
      orderCol, col("_json"), source, chunkSize)
  }

  /** Shared assembly: group by chunk id, join docs in row order (sort the
    * collected (rn, doc) structs — `collect_list` order is NOT stable under
    * parallel merge, the sort makes it deterministic), content-hash id. */
  private def assemble(numbered: DataFrame, source: String, sep: String = DefaultSep): DataFrame = {
    val joined = numbered
      .groupBy(col("_chunk_no").as("chunk_no"))
      .agg(
        concat_ws(
          sep,
          transform(
            array_sort(collect_list(struct(col("_rn").as("rn"), col("_doc").as("doc")))),
            s => s.getField("doc"))).as("text"),
        count(lit(1)).as("n_rows"))
    joined.select(
      col("chunk_no"),
      PortableHash.contentId(source, col("text")).as("id"),
      lit(source).as("source"),
      col("text"),
      col("n_rows"))
  }
}
