package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Streaming count-min sketch — the incremental face of the batch
  * text_cms_sketch grid. The grid cell a token lands in is computed
  * UPSTREAM with the shared TextQueries.cmsBucket column definition
  * (the ReservoirProcessor contract: the processor never re-derives a
  * hash the batch side also derives — one definition or they silently
  * drift); the processor itself is the minimal keyed fold: one
  * ValueState[Long] counter per grid cell, incremented per arriving
  * token occurrence.
  *
  * The fold is COMMUTATIVE AND ASSOCIATIVE (pure addition — the very
  * property that makes CMS the distributed frequency sketch), so the
  * final grid is identical under ANY arrival order and any batching;
  * StreamingSpec feeds reversed uneven batches and demands exact cell
  * parity against the batch grid, then derives per-token estimates
  * consumer-side (min over the token's cells — the cross-cell read a
  * keyed processor must not do itself, per the FreshnessProcessor
  * principle) and matches the batch query's emission exactly.
  *
  * Scale posture: state is ONE long per grid cell — bounded by
  * depth×width (256), not by the token stream — hash-partitioned by
  * cell like any keyed aggregation; estimates cost one bounded lookup
  * per probed term. */
class CmsProcessor
  extends StatefulProcessor[Int, CmsProcessor.Ev, CmsProcessor.Cell] {
  import CmsProcessor._

  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("cnt",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Cell] = {
    var c: Long = if (st.exists()) st.get() else 0L
    var seen = false
    rows.foreach { _ => seen = true; c += 1L }
    if (!seen) Iterator.empty
    else {
      st.update(c)
      Iterator.single(Cell(key, key / 64, key % 64, c))
    }
  }
}

object CmsProcessor {
  case class Ev(cell: Int)

  /** Grid-cell count fact: cnt strictly grows per emission, so the
    * max-cnt row per cell in an append sink is the current counter. */
  case class Cell(cell: Int, r: Int, b: Int, cnt: Long)

  /** Incremental CMS over an unbounded (or replayed) cell stream —
    * `cell` must be r·64 + cmsBucket(tok, r), stamped upstream with
    * the shared definition. Works identically on a bounded batch
    * Dataset. */
  def cmsStream(rows: DataFrame): Dataset[Cell] = {
    import rows.sparkSession.implicits._
    rows.select(col("cell").cast("int").as("cell"))
      .as[Ev]
      .groupByKey(_.cell)
      .transformWithState(new CmsProcessor, TimeMode.None(), OutputMode.Append())
  }
}
