package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Sessionization on the transformWithState API (Spark 4's arbitrary-state
  * successor to flatMapGroupsWithState), sharing Streams.foldSessions so
  * the gap semantics exist in exactly one place. Bounded-input form: each
  * key's rows arrive in one call and every session (including the open
  * tail) is emitted — the transformWithState analog of
  * Streams.sessionize. An unbounded variant would hold the open tail in
  * the ValueState and flush it from a registered timer, exactly as
  * Streams.sessionizeStream does with an event-time timeout.
  * StreamingSpec asserts this agrees with session_window and
  * flatMapGroupsWithState on the fixture. */
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

object SessionProcessor {
  /** Bounded batch/stream-shared entry: sessionize with transformWithState. */
  def sessionize(events: Dataset[Streams.Ev], gapMinutes: Int): Dataset[Streams.SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.None(), OutputMode.Append())
  }
}
