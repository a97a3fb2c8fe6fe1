package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming STAR-EDGE index (r11, the r10 verdict's ask #5) — the
  * incremental face of the batch `TextQueries.minhashStarEdgesOver`
  * generator, the way LshIndexProcessor is the incremental face of the
  * all-pairs candidate join: per (source, band, band-hash) bucket the
  * state holds the residents, and arrivals emit STAR edges (bucket
  * center → member, center = min doc_id) instead of |b|²/2 pairs — the
  * linear-candidate feed the CC-family cluster consumers
  * (dedup_cluster_cc/incremental/persisted) read in batch.
  *
  * Order problem: the batch star set roots every bucket at its GLOBAL
  * min, but a stream can deliver that min last. Emitting bare edges
  * would strand stale centers (arrival 7,5,3 emits (5,7) then
  * (3,7),(3,5) — the (5,7) edge is not in the batch star). So the
  * processor emits UPSERT rows (bucket, member, center): when a new
  * center arrives it RE-EMITS every resident against it (the residents
  * are exactly what the ListState holds), and because a bucket's center
  * only ever decreases, the consumer resolves the final assignment with
  * one commutative fold — min(center) per (bucket, member) — making the
  * resolved edge set EQUAL to the batch star set under ANY batching
  * (StreamingSpec feeds reversed uneven batches; no ordering contract at
  * all, the LshIndexProcessor class). Emission volume: one row per
  * arrival plus |residents| rows per center change — at most one
  * re-emission wave per distinct prefix-min, so an id-ascending
  * production feed (the DedupProcessor contract) never re-emits and the
  * total is exactly |b|-1 rows per bucket, the batch star cardinality.
  *
  * Scale posture: state shards on the bucket key; resolution is a keyed
  * min-aggregate (map-side partial), never a window. */
class StarEdgeProcessor
  extends StatefulProcessor[String, StarEdgeProcessor.Bucket, StarEdgeProcessor.Assign] {

  @transient private var ids: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ids = getHandle.getListState[Long]("ids", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[StarEdgeProcessor.Bucket],
      timerValues: TimerValues): Iterator[StarEdgeProcessor.Assign] = {
    val existing = ids.get().toSeq
    val fresh = rows.map(_.doc_id).toSeq.distinct.filterNot(existing.contains)
    if (fresh.isEmpty) return Iterator.empty
    val all = existing ++ fresh
    val center = all.min
    val out =
      if (existing.nonEmpty && center == existing.min)
        // center unchanged: only the fresh arrivals point at it
        fresh.filter(_ != center).map(m => StarEdgeProcessor.Assign(key, m, center))
      else
        // first batch for the bucket, or a new (smaller) center arrived:
        // point EVERY resident at it — earlier (m, old_center) rows are
        // superseded because the consumer's min(center) fold picks this one
        all.filter(_ != center).map(m => StarEdgeProcessor.Assign(key, m, center))
    fresh.foreach(ids.appendValue)
    out.iterator
  }
}

object StarEdgeProcessor {
  case class Bucket(doc_id: Long, source: String, band: Int, bh: String)
  /** One upsert row: in bucket `bk`, member `doc_b`'s current center. */
  case class Assign(bk: String, doc_b: Long, ctr: Long)

  /** Incremental star-edge assignments over a (doc_id, source, text)
    * stream — same bucket definition as every batch minhash consumer. */
  def assignStream(docs: DataFrame): Dataset[Assign] = {
    import docs.sparkSession.implicits._
    graft.queries.TextQueries.minhashBuckets(docs).as[Bucket]
      .groupByKey(b => b.source + "|" + b.band + "|" + b.bh)
      .transformWithState(new StarEdgeProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Resolve the upsert stream to the final star-edge SET: min center
    * per (bucket, member) — commutative, so any batching/order lands the
    * same set — then project to edges and dedup across buckets, exactly
    * like the batch generator's distinct(). */
  def resolveEdges(assigns: DataFrame): DataFrame =
    assigns.groupBy("bk", "doc_b").agg(min("ctr").as("doc_a"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
}
