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
  *    chunk membership — testable, oracle-checkable. The global
  *    `row_number` is a single-partition shuffle; use for bounded inputs
  *    (the reference's own batches are bounded by a poll interval).
  *  - [[chunkScalable]]: partition-local chunk ids salted by
  *    `spark_partition_id` — no global ordering barrier, arbitrary-but-
  *    deterministic-per-partition boundaries. The reference's own chunk
  *    boundaries are arbitrary arrival order (`SELECT *` with no ORDER BY,
  *    `service_layer/service.py:53-57`), so this matches its contract at
  *    any scale.
  */
object Chunker {

  val DefaultChunkSize = 100 // service_layer/service.py:109

  /** Deterministic chunking: order by `orderCol`, group rows into chunks of
    * `chunkSize`, space-join `docCol` values in order.
    * Output: (chunk_no, id, source, text, n_rows). */
  def chunkDeterministic(
      df: DataFrame,
      orderCol: Column,
      docCol: Column,
      source: String,
      chunkSize: Int = DefaultChunkSize): DataFrame = {
    val w = Window.orderBy(orderCol)
    val numbered = df
      .withColumn("_rn", row_number().over(w))
      .withColumn("_chunk_no", floor((col("_rn") - 1) / chunkSize))
      .select(col("_chunk_no"), col("_rn"), docCol.as("_doc"))
    assemble(numbered, source)
  }

  /** Scalable chunking: chunk ids are (partition, local row index / size) —
    * zero global shuffle before the group-by, which then shuffles only
    * (chunk_key, doc) pairs. */
  def chunkScalable(
      df: DataFrame,
      docCol: Column,
      source: String,
      chunkSize: Int = DefaultChunkSize): DataFrame = {
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
    assemble(numbered, source)
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
  private def assemble(numbered: DataFrame, source: String): DataFrame = {
    val joined = numbered
      .groupBy(col("_chunk_no").as("chunk_no"))
      .agg(
        concat_ws(
          " ",
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
