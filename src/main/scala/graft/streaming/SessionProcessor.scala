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
}
