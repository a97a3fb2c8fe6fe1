package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Streaming per-source freshness monitor — the streaming face of the
  * batch dq_freshness query (round-6 candidate list): keyed by
  * event_type, one ValueState watermark per source folds each
  * micro-batch into (last-seen event time, running count). The fold is
  * COMMUTATIVE (max/count only), so like OhlcProcessor — and unlike
  * DedupProcessor's id-ascending contract — it reproduces the batch
  * result under ANY arrival order and any batching; StreamingSpec feeds
  * reversed uneven batches to prove it.
  *
  * hours_behind is deliberately NOT computed here: it depends on the
  * GLOBAL max across sources, which a keyed processor cannot see (and
  * must not — a cross-key read would serialize the state store). The
  * monitor emits per-source (last_ts, n) facts; the consumer derives
  * lag against whatever clock it trusts (the batch query uses the
  * cross-source max — StreamingSpec reproduces exactly that from the
  * emitted facts and matches dq_freshness row-for-row).
  *
  * Scale posture: state is one fixed-width pair per source — bounded by
  * the source-key space, not the event count — hash-partitioned by the
  * grouping key like any keyed aggregation. */
class FreshnessProcessor
  extends StatefulProcessor[String, FreshnessProcessor.Ev, FreshnessProcessor.Fresh] {
  import FreshnessProcessor._

  @transient private var st: ValueState[Fresh] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Fresh]("fresh",
      Encoders.product[Fresh], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Fresh] = {
    var f: Fresh = if (st.exists()) st.get() else null
    rows.foreach { e =>
      val tUs = Streams.toUs(e.ts)
      f =
        if (f == null) Fresh(key, tUs, 1L)
        else Fresh(key, math.max(f.last_us, tUs), f.n + 1L)
    }
    if (f == null) Iterator.empty
    else { st.update(f); Iterator.single(f) }
  }
}

object FreshnessProcessor {
  case class Ev(event_type: String, ts: java.sql.Timestamp)

  /** Per-source freshness fact: last event time (µs) + running count.
    * n strictly grows per emission, so the max-n row per source in an
    * append sink is the current watermark. */
  case class Fresh(event_type: String, last_us: Long, n: Long)

  /** Incremental per-source freshness over an unbounded (or replayed)
    * event stream. Works identically on a bounded batch Dataset. */
  def freshnessStream(events: DataFrame): Dataset[Fresh] = {
    import events.sparkSession.implicits._
    events.select(col("event_type"), col("ts"))
      .as[Ev]
      .groupByKey(_.event_type)
      .transformWithState(new FreshnessProcessor, TimeMode.None(), OutputMode.Append())
  }
}
