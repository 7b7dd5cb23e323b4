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
  *    DISTRIBUTED global numbering (range partition + per-partition counts
  *    + broadcast offsets), NOT a single-partition `Window.orderBy`: same
  *    chunk boundaries, no one-executor bottleneck.
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
    * Global row numbers WITHOUT a single-partition window (the classic
    * zipWithIndex-for-DataFrames): range-partition by the order key, sort
    * within partitions, take `monotonically_increasing_id` = (partition <<
    * 33) | local index, then add broadcast per-partition cumulative offsets.
    *
    * The indexed relation is localCheckpoint'ed (eager) before being read
    * by both the counts pass and the numbering pass: range partitioning
    * SAMPLES its input to pick bounds, so two independent executions of
    * the same repartitionByRange can bucket rows differently — offsets
    * computed on one partitioning applied to another would corrupt the
    * numbering. Materializing once makes both passes see identical
    * partitions by construction (exchange reuse would usually dedupe the
    * scan anyway, but correctness must not hinge on an optimizer
    * optimization). Every stage is fully distributed; the only
    * driver-size object is the (≤ numPartitions)-row offsets relation,
    * which is broadcast. */
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
    // partition-local index in sorted order: m_i_i is assigned in row-flow
    // order, which the preceding intra-partition sort makes deterministic
    // (_doc as tiebreak: equal (ord, doc) rows are interchangeable)
    val indexed = df
      .select(orderCol.as("_ord"), docCol.as("_doc"))
      .repartitionByRange(nPart, col("_ord"))
      .sortWithinPartitions(col("_ord"), col("_doc"))
      .withColumn("_mid", monotonically_increasing_id())
      .select(
        shiftright(col("_mid"), 33).as("_pid"),
        col("_mid").bitwiseAND(lit((1L << 33) - 1)).as("_local"),
        col("_doc"))
      .localCheckpoint() // one materialization; both passes below share it
    // per-range-partition sizes: partial-aggregates to one row per partition
    // map-side, so the counts pass shuffles ~nPart rows
    val counts = indexed.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    // exclusive prefix sum over the tiny counts relation (range partition
    // ids are ordered by _ord, so offset order == global order). The
    // constant-valued-but-non-foldable partition key keeps this off the
    // "all data to a single partition" warning path (a foldable key would
    // be stripped by EliminateWindowPartitions) — by construction this
    // window sees ≤ nPart rows, one per range partition
    val wOff = Window.partitionBy(pmod(col("_pid"), lit(1L))).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    val numbered = indexed
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("_rn", col("_off") + col("_local") + lit(1L))
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
      chunkSize: Int = DefaultChunkSize): DataFrame =
    chunkDeterministic(df.withColumn("_json", JsonRows.toJsonCol(df)), orderCol, col("_json"), source, chunkSize)

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
