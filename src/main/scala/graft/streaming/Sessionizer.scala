package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Custom stateful streaming (SURVEY §2.6 T5 extension): gap-based session
  * windows per user via `flatMapGroupsWithState` — the arbitrary-state API
  * for semantics the built-in windowed aggregations can't express (a
  * session closes only when the NEXT event is observed beyond the gap, or
  * the state times out).
  *
  * State per key is O(1) (the open session's aggregates), emitted sessions
  * are append-only — the shape that scales to millions of keys: state
  * lives in the state store, partitioned by key, checkpointed per batch.
  */
object Sessionizer {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, end: Long, n: Long, total: Double)
  case class Session(user_id: Long, start_ts: Timestamp, end_ts: Timestamp, n: Long, total_value: Double)

  val DefaultGapMs: Long = 30 * 60 * 1000

  /** Batch-or-stream sessionize over a typed event Dataset. Works on a
    * streaming Dataset with `OutputMode.Append` + checkpointing, and on a
    * static Dataset for tests (Spark runs the same state function). */
  def sessionize(events: Dataset[Event], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          // sort this batch's events; fold them through the open session
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            open match {
              case Some(s) if t - s.end <= gapMs =>
                open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
              case Some(s) =>
                closed += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                open = Some(OpenSession(t, t, 1, e.value))
              case None =>
                open = Some(OpenSession(t, t, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Flush helper for tests/batch: emit still-open sessions as final. */
  def sessionizeBatchComplete(spark: SparkSession, events: Dataset[Event], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import spark.implicits._
    val evs = events.collect().groupBy(_.user_id)
    evs.toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.value))
      var open: Option[OpenSession] = None
      val out = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.end <= gapMs =>
            open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
          case Some(s) =>
            out += Session(uid, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
            open = Some(OpenSession(t, t, 1, e.value))
          case None => open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach(s => out += Session(uid, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
      out.result()
    }.toDS()
  }
}
