package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.9 capability rows).
  *
  * The reference's pipeline is Airflow-scheduled micro-batches
  * (/root/reference/README.md:9); Structured Streaming is the same dialect
  * running incrementally: each transformation here is a plain
  * DataFrame => DataFrame that works identically on a batch table and on a
  * readStream source — that batch/stream parity is asserted in
  * StreamingSpec, and the batch results are oracle-checked via the
  * ts_* queries. At scale the state store is per-partition (keyed by
  * user_id), so sessionization distributes like any keyed aggregation. */
object Streams extends Serializable {

  /** Tumbling 1-hour counts per event type — same plan shape as the
    * ts_tumbling declared query. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  /** Watermarked variant for streaming use: late rows beyond `delay` are
    * dropped and windows finalize (append mode). */
  def tumblingCountsWatermarked(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    tumblingCounts(events.withWatermark("ts", delay))

  /** Keep-latest CDC compaction as a streaming dedup:
    * dropDuplicatesWithinWatermark on the upsert key. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  // ---- custom state: sessionization via flatMapGroupsWithState ----

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionOut(user_id: Long, sess_start: java.sql.Timestamp,
    sess_end: java.sql.Timestamp, n_events: Long, sum_value_cents: Long)
  case class SessState(openStart: Long, openLast: Long, n: Long, cents: Long)

  /** java.sql.Timestamp.getTime is millis; the sub-second microseconds
    * live in the nanos field — drop either and the boundaries drift off
    * session_window's µs event time. */
  def toUs(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  def fromUs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def emitSession(uid: Long, st: SessState, gapUs: Long): SessionOut =
    SessionOut(uid, fromUs(st.openStart), fromUs(st.openLast + gapUs), st.n, st.cents)

  /** The one shared session fold (half-open semantics: an event at exactly
    * last+gap opens a NEW session, same as Spark's session_window): merge
    * sorted events into an optional prior open session; returns closed
    * sessions in order plus the still-open tail. Both the bounded and the
    * incremental sessionizers call this — the gap logic exists once. */
  def foldSessions(prior: Option[SessState], evs: Seq[Ev], gapUs: Long)
      : (List[SessState], Option[SessState]) = {
    var closed = List.empty[SessState]
    var cur = prior.orNull
    evs.sortBy(e => (toUs(e.ts), e.value)).foreach { e =>
      val tUs = toUs(e.ts)
      val cents = math.floor(e.value * 100.0 + 0.5).toLong
      cur match {
        case null =>
          cur = SessState(tUs, tUs, 1, cents)
        case s if tUs - s.openLast >= gapUs =>
          closed ::= s
          cur = SessState(tUs, tUs, 1, cents)
        case s =>
          cur = SessState(s.openStart, math.max(s.openLast, tUs), s.n + 1, s.cents + cents)
      }
    }
    (closed.reverse, Option(cur))
  }

  /** Bounded-input sessionization (each group arrives complete — a batch
    * table or a full per-user replay of the Airflow feed): every session
    * including the trailing one is emitted. For unbounded streams use
    * sessionizeStream, which holds the open session in state. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    def fn(uid: Long, it: Iterator[Ev], state: GroupState[SessState]): Iterator[SessionOut] = {
      val (closed, open) = foldSessions(None, it.toSeq, gapUs)
      (closed ++ open.toList).map(emitSession(uid, _, gapUs)).iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Incremental sessionization for unbounded streams: closed sessions are
    * emitted as soon as a later event proves the gap; the open session is
    * HELD in GroupState across micro-batches and flushed by an event-time
    * timeout once the watermark passes openLast+gap. Requires
    * withWatermark("ts", …) upstream. */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    def fn(uid: Long, it: Iterator[Ev], state: GroupState[SessState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(emitSession(uid, _, gapUs)).iterator
        state.remove()
        out
      } else {
        val (closed, open) = foldSessions(state.getOption, it.toSeq, gapUs)
        open match {
          case Some(o) =>
            state.update(o)
            // flush when the watermark passes the session's half-open end
            state.setTimeoutTimestamp((o.openLast + gapUs) / 1000L)
          case None => state.remove()
        }
        closed.map(emitSession(uid, _, gapUs)).iterator
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
