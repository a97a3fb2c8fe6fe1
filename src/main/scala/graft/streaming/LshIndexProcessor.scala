package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming LSH index — the incremental face of the batch
  * text_minhash_lsh candidate join: the state store IS the LSH index.
  *
  * Keyed by the (source, band, band-hash) bucket (the batch join key,
  * computed by the SAME TextQueries.minhashBuckets expressions), each key
  * holds the doc ids previously seen in that bucket in a ListState. A new
  * doc emits a candidate pair against every resident of each of its 8
  * buckets, then joins the residency — so candidates stream out as docs
  * land, instead of a periodic all-corpus rebuild.
  *
  * Pairs may repeat across buckets (two docs agreeing on two bands emit
  * twice — the batch query's `distinct()` applied downstream), and the
  * pair SET equals the batch candidate set on any replay, regardless of
  * batching (StreamingSpec proves it): bucket membership is
  * arrival-order-independent, so unlike first-seen dedup this operator
  * needs no ordering assumption at all.
  *
  * Scale posture: state shards on the bucket key like any keyed
  * aggregation; a bucket's residency list is the same cardinality the
  * batch join's per-bucket block has, so state size tracks the batch
  * shuffle's build side. */
class LshIndexProcessor
  extends StatefulProcessor[String, LshIndexProcessor.Bucket, LshIndexProcessor.Pair] {

  @transient private var ids: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ids = getHandle.getListState[Long]("ids", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[LshIndexProcessor.Bucket],
      timerValues: TimerValues): Iterator[LshIndexProcessor.Pair] = {
    val existing = ids.get().toSeq
    // a doc can hit the same bucket once per micro-batch only; distinct
    // guards hypothetical replays inside one batch
    val fresh = rows.map(_.doc_id).toSeq.distinct.filterNot(existing.contains)
    val out = (
      // new vs already-resident
      for (n <- fresh; e <- existing)
        yield LshIndexProcessor.Pair(math.min(n, e), math.max(n, e))
    ) ++ (
      // new vs new within this batch
      for (i <- fresh.indices; j <- i + 1 until fresh.size)
        yield LshIndexProcessor.Pair(
          math.min(fresh(i), fresh(j)), math.max(fresh(i), fresh(j)))
    )
    fresh.foreach(ids.appendValue)
    out.iterator
  }
}

object LshIndexProcessor {
  case class Bucket(doc_id: Long, source: String, band: Int, bh: String)
  case class Pair(doc_a: Long, doc_b: Long)

  /** Incremental near-dup candidate pairs over a (doc_id, source, text)
    * stream. Works identically on a bounded batch frame. */
  def candidatePairsStream(docs: DataFrame): Dataset[Pair] = {
    import docs.sparkSession.implicits._
    graft.queries.TextQueries.minhashBuckets(docs).as[Bucket]
      // explicit "|" separators: band is 0-9 and bh opens with a hash
      // digit, so bare concatenation could collide across (source, band)
      .groupByKey(b => b.source + "|" + b.band + "|" + b.bh)
      .transformWithState(new LshIndexProcessor, TimeMode.None(), OutputMode.Append())
  }
}
