package graft

import graft.operators.RankStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Oracle: the naive per-group full-sort window. */
  private def naive(df: DataFrame, ranksOfN: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column]): Set[(String, Long, Double)] = {
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val wg = Window.partitionBy(col("g"))
    df.withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wg))
      .withColumn("_wanted", array_distinct(array(ranksOfN(col("_n")): _*)))
      .where(array_contains(col("_wanted"), col("_rk")))
      // ties: the naive window may pick a different ROW at a rank, but
      // the VALUE at a rank is unique — compare (g, rank, value)
      .select(col("g"), col("_rk"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def twoPhase(df: DataFrame, ranksOfN: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column], parts: Int = 8): Set[(String, Long, Double)] =
    RankStats.atRanks(df, "g", "v", ranksOfN, parts)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private val medianBracket: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column] =
    n => Seq(greatest(lit(1L), floor(n * 0.498)), least(n, ceil(n * 0.502)))

  test("matches naive window on random data with ties") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 500) / 10.0) // many ties
    }
    val df = rows.toDF("g", "v")
    assert(twoPhase(df, medianBracket) == naive(df, medianBracket))
  }

  test("matches naive at arbitrary rank sets (min, max, quartiles)") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(i => (s"g${i % 4}", rnd.nextGaussian() * 100)).toDF("g", "v")
    val ranks: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column] =
      n => Seq(lit(1L), n, greatest(lit(1L), floor(n * 0.25)), greatest(lit(1L), floor(n * 0.75)))
    assert(twoPhase(df, ranks) == naive(df, ranks))
  }

  test("single-row and two-row groups (rank clamping, lo == hi)") {
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    assert(twoPhase(df, medianBracket) == naive(df, medianBracket))
  }

  test("all-equal values collapse to one block and still pick the ranks") {
    val df = (1 to 300).map(_ => ("g0", 7.5)).toDF("g", "v")
    assert(twoPhase(df, medianBracket) == naive(df, medianBracket))
  }

  test("skewed domain (one huge outlier shrinks every other block)") {
    val rows = (1 to 1000).map(i => ("g0", i.toDouble / 1000)) :+ (("g0", 1.0e12))
    val df = rows.toDF("g", "v")
    assert(twoPhase(df, medianBracket) == naive(df, medianBracket))
  }

  test("exactly one row per distinct (group, rank)") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 1000).map(i => (s"g${i % 2}", rnd.nextInt(20).toDouble)).toDF("g", "v")
    val out = RankStats.atRanks(df, "g", "v", medianBracket, parts = 8)
      .groupBy("g", "_rank").count().where(col("count") =!= 1)
    assert(out.isEmpty)
  }

  test("null value fails loudly, never silently drops the row") {
    val df = Seq(("a", java.lang.Double.valueOf(1.0)), ("a", null: java.lang.Double))
      .toDF("g", "v")
    val e = intercept[Exception] {
      RankStats.atRanks(df, "g", "v", medianBracket, parts = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("RankStats.atRanks")),
      s"expected the precondition guard, got: $e")
  }

  test("NaN value fails loudly, never silently drops the row") {
    val df = Seq(("a", 1.0), ("a", Double.NaN)).toDF("g", "v")
    val e = intercept[Exception] {
      RankStats.atRanks(df, "g", "v", medianBracket, parts = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("RankStats.atRanks")),
      s"expected the precondition guard, got: $e")
  }

  test("no single-task full-group sort: window partitions include the block id") {
    val df = (1 to 100).map(i => ("g0", i.toDouble)).toDF("g", "v")
    val plan = RankStats.atRanks(df, "g", "v", medianBracket, parts = 8)
      .queryExecution.optimizedPlan.toString()
    // the rank window must be keyed by (g, _blk), never by g alone
    assert(plan.contains("_blk"), s"expected block-partitioned window in:\n$plan")
  }
}
