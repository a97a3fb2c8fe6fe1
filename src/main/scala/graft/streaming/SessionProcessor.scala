package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Sessionization on the transformWithState API (Spark 4's arbitrary-state
  * successor to flatMapGroupsWithState): same gap semantics as
  * Streams.sessionize, state held in a typed ValueState backed by the
  * RocksDB state store. StreamingSpec asserts all three session
  * implementations (session_window, flatMapGroupsWithState,
  * transformWithState) agree on the fixture. */
class SessionProcessor(gapMinutes: Int)
  extends StatefulProcessor[Long, Streams.Ev, Streams.SessionOut] {

  private val gapUs = gapMinutes * 60L * 1000000L
  @transient private var state: ValueState[Streams.SessState] = _

  private def toUs(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromUs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  private def emit(uid: Long, st: Streams.SessState): Streams.SessionOut =
    Streams.SessionOut(uid, fromUs(st.openStart), fromUs(st.openLast + gapUs),
      st.n, st.cents)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Streams.SessState]("session",
      Encoders.product[Streams.SessState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Streams.Ev],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Streams.SessionOut] = {
    val evs = rows.toSeq.sortBy(e => (toUs(e.ts), e.value))
    var out = List.empty[Streams.SessionOut]
    var cur = if (state.exists()) state.get() else null
    evs.foreach { e =>
      val tUs = toUs(e.ts)
      val cents = math.floor(e.value * 100.0 + 0.5).toLong
      cur match {
        case null =>
          cur = Streams.SessState(tUs, tUs, 1, cents)
        case s if tUs - s.openLast >= gapUs =>
          out ::= emit(key, s)
          cur = Streams.SessState(tUs, tUs, 1, cents)
        case s =>
          cur = Streams.SessState(s.openStart, math.max(s.openLast, tUs),
            s.n + 1, s.cents + cents)
      }
    }
    if (cur != null) { out ::= emit(key, cur); state.clear() }
    out.reverseIterator
  }
}

object SessionProcessor {
  /** Batch/stream-shared entry: sessionize with transformWithState. */
  def sessionize(events: Dataset[Streams.Ev], gapMinutes: Int): Dataset[Streams.SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.None(), OutputMode.Append())
  }
}
