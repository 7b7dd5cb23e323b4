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

  test("as-of semantics: latest right at-or-before, ties by tiebreaker, left-outer") {
    val out = AsOfJoin.asof(trades, quotes, "k", "k", "tts", "qts", "quote_id")
      .select("trade_id", "quote_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
    assert(out(100L).contains((1L, 10.0)))
    assert(out(101L).contains((3L, 12.0))) // <= includes same-instant; max tiebreaker
    assert(out(102L).contains((3L, 12.0)))
    assert(out(103L).isEmpty)
    assert(out(104L).isEmpty)
    assert(out.size == 5) // every left row exactly once
  }
}
