package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Streaming deterministic sample reservoir — the incremental twin of
  * the batch salted-hash samplers (sample_interleave's per-source
  * bottom-k rank): per source, keep the k documents with the SMALLEST
  * (reservoirKey hash, doc_id) pairs seen so far. Unlike a classic
  * random reservoir (order-dependent by construction), the bottom-k-by-
  * hash reservoir is a pure min-k fold — COMMUTATIVE and idempotent per
  * element — so ANY batching or arrival order lands the identical
  * sample, and the stream's final snapshot equals the batch recompute
  * over the same rows (StreamingSpec feeds REVERSED uneven batches and
  * a duplicate replay to pin both properties).
  *
  * The hash column is computed UPSTREAM by the shared
  * SampleQueries.reservoirKey expression (one definition — the
  * processor never re-derives it), so the stream sample and any batch
  * selection keyed on the same salt agree doc-for-doc.
  *
  * Scale posture: state is <= k (hash, id) pairs per source key —
  * bounded by key-space x k, never by stream length; emission after
  * each batch is the <= k-row snapshot tagged with the running n_seen,
  * so an append-sink consumer keeps the max-n rows per source (the
  * HeavyHitterProcessor snapshot contract). */
class ReservoirProcessor(k: Int)
  extends StatefulProcessor[String, ReservoirProcessor.In, ReservoirProcessor.Out] {
  import ReservoirProcessor._

  @transient private var st: ValueState[Res] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Res]("res", Encoders.product[Res], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[In],
      timerValues: TimerValues): Iterator[Out] = {
    val prev: Res = if (st.exists()) st.get() else Res(Seq.empty, 0L)
    var nSeen = prev.n
    val incoming = rows.map { r => nSeen += 1; Entry(r.h, r.doc_id) }.toSeq
    // min-k fold: distinct guards replay idempotence (a re-delivered
    // doc_id carries the same hash, so it can never displace anything)
    val kept = (prev.items ++ incoming).distinct
      .sortBy(e => (e.h, e.doc_id)).take(k)
    st.update(Res(kept, nSeen))
    kept.iterator.map(e => Out(key, e.doc_id, e.h, nSeen))
  }
}

object ReservoirProcessor {
  case class In(source: String, doc_id: Long, h: Long)
  private[streaming] case class Entry(h: Long, doc_id: Long)
  private[streaming] case class Res(items: Seq[Entry], n: Long)

  /** One reservoir snapshot row; n_seen strictly grows per emission, so
    * the max-n rows per source in an append sink are the current
    * sample. */
  case class Out(source: String, doc_id: Long, h: Long, n_seen: Long)

  /** Incremental per-source deterministic sample over a document
    * stream; the order key is the SHARED reservoirKey salted hash. */
  def reservoirStream(docs: DataFrame, k: Int): Dataset[Out] = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), col("doc_id"),
        graft.queries.SampleQueries.reservoirKey(col("doc_id")).as("h"))
      .as[In]
      .groupByKey(_.source)
      .transformWithState(new ReservoirProcessor(k), TimeMode.None(), OutputMode.Append())
  }
}
