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

  /** Fold one key's (sorted-by-time) events through an optional open
    * session; returns (sessions closed by a gap, still-open session).
    * Shared by every sessionize variant so their gap semantics can't
    * drift.
    *
    * Memory bound: every call site materializes ONE KEY's events from ONE
    * micro-batch (or, for the batch-complete variant, the whole input) as
    * a sorted in-memory Seq, because gap semantics need time order and
    * Spark hands groups in arbitrary order. Stored STATE stays O(1) per
    * key; the transient buffer is O(events per key per batch) on one task
    * — fine for human-scale session keys (thousands of events/batch), but
    * a power-law hot key (a bot hammering one user_id) concentrates its
    * whole batch slice on one task. If sessions must run on such keys,
    * bound the batch first (e.g. `dedupedStream`, rate-limit the source,
    * or shorten the trigger interval so each batch slice stays small) —
    * an iterator-merge can't help, as sorting inherently buffers. */
  private def foldEvents(
      userId: Long,
      sorted: Seq[Event],
      initial: Option[OpenSession],
      gapMs: Long): (Seq[Session], Option[OpenSession]) = {
    var open = initial
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
    (closed.result(), open)
  }

  /** Batch-or-stream sessionize over a typed event Dataset. Works on a
    * streaming Dataset with `OutputMode.Append` + checkpointing, and on a
    * static Dataset for tests (Spark runs the same state function).
    *
    * `NoTimeout` means an open session is only ever closed by a LATER
    * event from the same key — a key that goes quiet holds its last
    * session open forever. Use [[sessionizeEventTime]] when sessions must
    * close once the stream's event-time watermark passes the gap. */
  def sessionize(events: Dataset[Event], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          val (closed, open) = foldEvents(userId, rows.toSeq.sortBy(e => (e.ts.getTime, e.value)), state.getOption, gapMs)
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** Streaming sessionize that ALSO closes sessions by event-time timeout:
    * the input must carry a watermark on `ts`; when the watermark passes an
    * open session's end + gap, the session is emitted without needing a
    * successor event from that key (the semantics `NoTimeout` cannot
    * express — an abandoned key's final session still closes). State per
    * key stays O(1); timeouts fire on the micro-batch after the watermark
    * crosses the deadline. */
  def sessionizeEventTime(
      events: Dataset[Event],
      gapMs: Long = DefaultGapMs,
      lateness: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap with no successor event: final
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
          } else {
            val (closed, open) = foldEvents(userId, rows.toSeq.sortBy(e => (e.ts.getTime, e.value)), state.getOption, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Batch flush: sessionize a STATIC Dataset and emit still-open sessions
    * as final. Distributed — one `flatMapGroups` partition-local fold per
    * key (the previous implementation collected every event to the
    * driver). */
  def sessionizeBatchComplete(spark: SparkSession, events: Dataset[Event], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid: Long, es: Iterator[Event]) =>
      val (closed, open) = foldEvents(uid, es.toSeq.sortBy(e => (e.ts.getTime, e.value)), None, gapMs)
      val tail = open.map(s => Session(uid, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
      (closed ++ tail).iterator
    }
  }
}
