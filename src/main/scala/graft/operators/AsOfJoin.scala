package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * `rightTime <= leftTime` on equal keys (SURVEY §2.4 — the watermark⋈table
  * pattern generalized; the reference's watermark lookup + strict cut is a
  * degenerate per-table case).
  *
  * Implementation is the SCALABLE formulation: tag and union both inputs,
  * sort per key by (time, tag, tiebreak) and carry the last-seen right row
  * with `last(_, ignoreNulls)` over the running frame. Cost is
  * O((|L|+|R|) log) in one shuffle by key — no left×right pair explosion,
  * unlike the join-then-rank formulation, and exactly the shape a
  * sort-merge as-of needs at 100 TB. Right rows at the same instant as a
  * left row ARE visible (<= semantics: the right tag sorts first); ties
  * among right rows resolve to the greatest `tieBreaker` (deterministic).
  * Unmatched left rows keep null right columns (left-outer semantics).
  */
object AsOfJoin {

  /** A null literal with the exact struct type of `df`'s row. */
  private def nullRow(df: DataFrame): Column = {
    val st = org.apache.spark.sql.types.StructType(df.schema.fields)
    lit(null).cast(st)
  }

  private def asStruct(df: DataFrame): Column =
    struct(df.columns.toSeq.map(col): _*)

  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tieBreaker: String): DataFrame = {
    // Drop null-key right rows BEFORE the union: window partitioning groups
    // NULL keys together, so without this a null-key left row would "match"
    // a null-key right row — diverging from SQL equality semantics (and
    // from AsOfJoinExec, which emits null right columns for null left keys).
    val rightKeyed = right.where(col(rightKey).isNotNull)
    val taggedRight = rightKeyed.select(
      col(rightKey).as("_k"),
      col(rightTime).cast("timestamp").as("_t"),
      lit(0).as("_tag"),
      col(tieBreaker).cast("long").as("_tb"),
      asStruct(right).as("_r"),
      nullRow(left).as("_l"))

    val taggedLeft = left.select(
      col(leftKey).as("_k"),
      col(leftTime).cast("timestamp").as("_t"),
      lit(1).as("_tag"),
      lit(Long.MaxValue).as("_tb"),
      nullRow(right).as("_r"),
      asStruct(left).as("_l"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)

    val leftOut = left.columns.toSeq.map(c => col("_l").getField(c).as(c))
    val rightOut = right.columns.toSeq.map(c => col("_match").getField(c).as(c))
    carried.select(leftOut ++ rightOut: _*)
  }
}
