package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Sessionization on the transformWithState API (Spark 4's arbitrary-state
  * successor to flatMapGroupsWithState), sharing Streams.foldSessions so
  * the gap semantics exist in exactly one place. Bounded-input form: each
  * key's rows arrive in one call and every session (including the open
  * tail) is emitted — the transformWithState analog of
  * Streams.sessionize. The unbounded variant is SessionStreamProcessor
  * below (event-time timers). StreamingSpec asserts both agree with
  * session_window and flatMapGroupsWithState on the fixture. */
class SessionProcessor(gapMinutes: Int)
  extends StatefulProcessor[Long, Streams.Ev, Streams.SessionOut] {

  private val gapUs = gapMinutes * 60L * 1000000L
  @transient private var state: ValueState[Streams.SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Streams.SessState]("session",
      Encoders.product[Streams.SessState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Streams.Ev],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Streams.SessionOut] = {
    val prior = if (state.exists()) Some(state.get()) else None
    val (closed, open) = Streams.foldSessions(prior, rows.toSeq, gapUs)
    state.clear()
    (closed ++ open.toList).map(Streams.emitSession(key, _, gapUs)).iterator
  }
}

/** UNBOUNDED sessionization on transformWithState: the open session tail
  * is HELD in ValueState across micro-batches; closed sessions are emitted
  * as soon as a later event proves the gap; an EVENT-TIME TIMER registered
  * at openLast+gap flushes the tail once the watermark passes it — the
  * transformWithState mirror of Streams.sessionizeStream's
  * EventTimeTimeout. Requires withWatermark("ts", …) upstream and
  * TimeMode.EventTime. One timer is live per open session: extending a
  * session deletes the stale timer before registering the new one (a
  * stale timer firing against a newer open session would flush it early —
  * timers are per-key-per-timestamp, not keyed slots). */
class SessionStreamProcessor(gapMinutes: Int)
  extends StatefulProcessor[Long, Streams.Ev, Streams.SessionOut] {

  private val gapUs = gapMinutes * 60L * 1000000L
  @transient private var state: ValueState[Streams.SessState] = _

  private def timerMs(s: Streams.SessState): Long = (s.openLast + gapUs) / 1000L

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Streams.SessState]("session",
      Encoders.product[Streams.SessState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Streams.Ev],
      timerValues: TimerValues): Iterator[Streams.SessionOut] = {
    val prior = if (state.exists()) Some(state.get()) else None
    val (closed, open) = Streams.foldSessions(prior, rows.toSeq, gapUs)
    prior.foreach(p => getHandle.deleteTimer(timerMs(p)))
    open match {
      case Some(o) =>
        state.update(o)
        getHandle.registerTimer(timerMs(o))
      case None => state.clear()
    }
    closed.map(Streams.emitSession(key, _, gapUs)).iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[Streams.SessionOut] = {
    // the registered timer always tracks the CURRENT open session (stale
    // ones are deleted on update), so firing means watermark > openLast+gap
    val out = if (state.exists())
      Iterator.single(Streams.emitSession(key, state.get(), gapUs))
    else Iterator.empty
    state.clear()
    out
  }
}

/** UPSERT-SNAPSHOT sessionization — the shape that puts CROSS-BATCH
  * session state into the ORACLED contract (r14, the r13 verdict's
  * "Next round" #2). Every micro-batch it emits the CURRENT snapshot of
  * every session the batch touched — gap-proven sessions final, the
  * open tail as-of the batch — and holds the open tail in ValueState
  * across batches. The consumer resolves with ONE commutative,
  * IDEMPOTENT fold: max(struct(n_events, sess_end, cents)) per
  * (user_id, sess_start) — n_events strictly increases when a session
  * extends, so the max IS the latest snapshot, and replayed batches
  * collapse (the StarEdgeProcessor/SeqGapProcessor upsert convention).
  *
  * Arrival contract (DedupProcessor-class): per-user time-ascending
  * ACROSS batches (any order within a batch — foldSessions sorts);
  * under it a session's sess_start is pinned by its first event and
  * every extension re-emits the same (user, start) key with a larger
  * snapshot, so the RESOLVED set equals the batch session_window result
  * EXACTLY — including each user's trailing open session. That is why
  * stream_session_multibatch's oracle can be ts_session's
  * gaps-and-islands SQL verbatim (at exact-cents grain), where the
  * event-time-timer variant above CANNOT be batch-equal in an append
  * sink: a trailing open session whose end exceeds the final watermark
  * never flushes (the timer needs the watermark to pass openLast+gap,
  * and the watermark stops at max(ts)) — exact set parity for an
  * append stream needs upsert emission + a fold consumer, the r11
  * StarEdgeProcessor lesson. */
class SessionSnapshotProcessor(gapMinutes: Int)
  extends StatefulProcessor[Long, Streams.Ev, Streams.SessionOut] {

  private val gapUs = gapMinutes * 60L * 1000000L
  @transient private var state: ValueState[Streams.SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Streams.SessState]("session",
      Encoders.product[Streams.SessState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Streams.Ev],
      timerValues: TimerValues): Iterator[Streams.SessionOut] = {
    val prior = if (state.exists()) Some(state.get()) else None
    val (closed, open) = Streams.foldSessions(prior, rows.toSeq, gapUs)
    open match {
      case Some(o) => state.update(o)
      case None => state.clear()
    }
    // closed sessions are final snapshots; the open tail's snapshot is
    // superseded by a later, larger one if the session extends — the
    // resolution fold keeps exactly the latest per (user, start)
    (closed ++ open.toList).map(Streams.emitSession(key, _, gapUs)).iterator
  }
}

object SessionProcessor {
  /** Bounded batch/stream-shared entry: sessionize with transformWithState. */
  def sessionize(events: Dataset[Streams.Ev], gapMinutes: Int): Dataset[Streams.SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.None(), OutputMode.Append())
  }

  /** Unbounded streaming entry: event-time timers flush open sessions.
    * Input must carry a watermark on ts. */
  def sessionizeStream(events: Dataset[Streams.Ev], gapMinutes: Int): Dataset[Streams.SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionStreamProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Upsert-snapshot streaming entry (r14): cross-batch state with an
    * EXACTLY-batch-equal resolved set under the per-user time-ascending
    * arrival contract. No watermark, no timers (TimeMode.None — also
    * means no trailing no-data micro-batch commits). Resolve the
    * emission with [[resolveSessionSnapshots]]. */
  def sessionizeSnapshots(events: Dataset[Streams.Ev], gapMinutes: Int): Dataset[Streams.SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionSnapshotProcessor(gapMinutes),
        TimeMode.None(), OutputMode.Append())
  }

  /** The ONE resolution fold for snapshot emissions (the resolveEdges
    * convention — the processor and its consumer must never drift):
    * latest snapshot per (user_id, sess_start) via a commutative,
    * idempotent max(struct(n_events, sess_end, cents)) — n_events
    * strictly increases across a session's snapshots, so the struct max
    * is the final state under ANY batching or replay. */
  def resolveSessionSnapshots(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(col("user_id"), col("sess_start"))
      .agg(max(struct(col("n_events"), col("sess_end"),
        col("sum_value_cents"))).as("m"))
      .select(col("user_id"), col("sess_start"),
        col("m.sess_end").as("sess_end"), col("m.n_events").as("n_events"),
        col("m.sum_value_cents").as("sum_cents"))
  }
}
