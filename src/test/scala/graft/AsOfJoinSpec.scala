package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    // key, time, quote_id, px
    ("A", ts("2024-01-01 00:00:00"), 1L, 10.0),
    ("A", ts("2024-01-01 00:10:00"), 2L, 11.0),
    ("A", ts("2024-01-01 00:10:00"), 3L, 12.0), // tie on time → id 3 wins
    ("B", ts("2024-01-01 00:30:00"), 4L, 20.0)).toDF("k", "qts", "quote_id", "px")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 00:05:00"), 100L), // after quote 1 only
    ("A", ts("2024-01-01 00:10:00"), 101L), // exactly at quotes 2/3 (<= visible), tie → 3
    ("A", ts("2024-01-01 00:50:00"), 102L), // after all → latest (3)
    ("B", ts("2024-01-01 00:00:00"), 103L), // before any B quote → null match
    ("C", ts("2024-01-01 00:00:00"), 104L)  // key with no right rows → null
  ).toDF("k", "tts", "trade_id")

  private def collectAsof(df: org.apache.spark.sql.DataFrame): Map[Long, Option[(Long, Double)]] =
    df.select("trade_id", "quote_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

  private def checkSemantics(out: Map[Long, Option[(Long, Double)]]): Unit = {
    assert(out(100L).contains((1L, 10.0)))
    assert(out(101L).contains((3L, 12.0))) // <= includes same-instant; max tiebreaker
    assert(out(102L).contains((3L, 12.0)))
    assert(out(103L).isEmpty)
    assert(out(104L).isEmpty)
    assert(out.size == 5) // every left row exactly once
  }

  test("as-of semantics (union+window composition)") {
    checkSemantics(collectAsof(AsOfJoin.asof(trades, quotes, "k", "k", "tts", "qts", "quote_id")))
  }

  test("as-of semantics (custom LogicalPlan+Strategy+Exec operator)") {
    val df = graft.plans.AsOfJoinPlan.asofExec(trades, quotes, "k", "k", "tts", "qts", "quote_id")
    checkSemantics(collectAsof(df))
    // and the physical plan really is the custom operator
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec not planned:\n$plan")
  }

  test("custom exec == composition on randomized data (200 lefts, 300 rights, 10 keys)") {
    val rnd = new scala.util.Random(11)
    val lefts = (1 to 200).map(i =>
      (rnd.nextInt(10).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "tts", "trade_id")
    val rights = (1 to 300).map(i =>
      (rnd.nextInt(12).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong, rnd.nextDouble()))
      .toDF("k", "qts", "quote_id", "px")
    val a = AsOfJoin.asof(lefts, rights, "k", "k", "tts", "qts", "quote_id")
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val b = graft.plans.AsOfJoinPlan.asofExec(lefts, rights, "k", "k", "tts", "qts", "quote_id")
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(a == b)
  }
}
