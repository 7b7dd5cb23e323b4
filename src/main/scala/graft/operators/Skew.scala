package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 "shuffle/partitioning" +
  * BASELINE north-star scale notes).
  *
  * AQE's skew-join splitting handles most runtime skew; these are for the
  * cases AQE can't fix: a grouped aggregation whose hot key floods one
  * reducer, and a broadcast-infeasible join against a skewed key column.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial-aggregates
    * the hot key across `salts` reducers, then a second tiny aggregation
    * merges the partials. Correct for any algebraic aggregate expressed as
    * (partial, merge) pairs — here count and decimal-exact sum. */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(crc32(monotonically_increasing_id().cast("string")), lit(salts)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol).cast("decimal(18,6)")).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).cast("long").as("n"), sum(col("_s")).cast("double").as("total"))
  }

  /** Salted join for a skewed fact side against a dimension too large to
    * broadcast: replicate each dim row `salts` times (explode), salt the
    * fact side randomly-but-deterministically, join on (key, salt). The
    * hot key's rows spread over `salts` reducers instead of one. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    val factSalted = fact.withColumn(
      "_salt", pmod(crc32(monotonically_increasing_id().cast("string")), lit(salts)).cast("int"))
    val dimReplicated = dim.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    factSalted.join(dimReplicated, Seq(key, "_salt")).drop("_salt")
  }
}
