package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Qutil._

/** SURVEY §2.8 streaming surface, DECLARED (r12 — the r11 verdict's
  * "Next round" #2): until this round every streaming face lived in
  * StreamingSpec only (19 transformWithState processors, parity-tested
  * but outside the CORRECTNESS contract). `stream_file_ingest` puts a
  * real Structured Streaming execution into the oracled catalog:
  *
  *   land an events shard (parquet, ONE file) → `readStream` file
  *   source → watermark + 1-day tumbling window aggregate →
  *   `writeStream` parquet sink under `Trigger.AvailableNow()` →
  *   read the sink back and emit it.
  *
  * Determinism (why this is plain-SQL oracleable): AvailableNow drains
  * the source then stops, and the shard is ONE file, so every row
  * arrives in batch 0 while the watermark is still unset — nothing is
  * ever late-dropped. After the data batch the watermark advances to
  * max(ts) − 0s, and the trailing no-data microbatch (Spark runs one
  * under AvailableNow precisely so final state flushes) emits every
  * window with end <= watermark to the append sink. The fixture's
  * max(ts) is never day-aligned (measured at all three SFs), so the
  * emitted set is exactly the windows strictly before the last partial
  * day — a pure function of the data that DuckDB mirrors with a
  * max(ts) cross join. StreamingSpec additionally pins the read-back
  * equal to the same aggregate run as a BATCH DataFrame (the
  * batch-equality contract of Structured Streaming).
  *
  * Scale shape: the streaming aggregate is a keyed partial-aggregable
  * groupBy over (type, window) — map-side combined per microbatch,
  * state bounded by (types × open windows), never stream length; the
  * sink is an ordinary partition-parallel parquet append. At 100 TB/day
  * the same plan runs continuously with a real trigger; AvailableNow is
  * the backfill/catch-up invocation of that identical query.
  */
object StreamQueries {

  /** Land `df` as `n` single-file shards under `src`, split into n
    * ascending ranges of the BIGINT `key` column, with strictly
    * ascending mtimes — the deterministic multi-batch file-source
    * arrangement: the file source lists unread files oldest-mtime-first
    * (latestFirst defaults false), so under maxFilesPerTrigger=1 the
    * processing order IS the range order. Shared by both multi-batch
    * streaming queries (one definition — the shard contract and its
    * consumers cannot drift). Returns (key min, key max) — one bounded
    * 1-row collect. */
  private def landAscendingShards(s: org.apache.spark.sql.SparkSession,
      df0: org.apache.spark.sql.DataFrame, key: String, src: String,
      n: Int): (Long, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(src))
    // n+1 consumers read this frame (the bounds agg + n shard writes) —
    // checkpoint or the source scan re-runs per consumer (the r11b
    // count-consumers rule; the dominant landing cost past fixture SF)
    val df = df0.transform(graft.operators.Scale.materialize)
    val b = df.agg(min(col(key)).as("mn"), max(col(key)).as("mx")).head
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val span = mx - mn + 1
    val cuts = (0 until n).map(i => mn + (span / n) * i) :+ (mx + 1)
    val base = System.currentTimeMillis() - 600000L
    for (i <- 0 until n) {
      val tmp = new org.apache.hadoop.fs.Path(src + s"_tmp$i")
      val shard = df.where(col(key) >= cuts(i) && col(key) < cuts(i + 1))
      // r13 ADVICE: a narrow or clustered key span (span < n, or values
      // piled into one range) lands EMPTY shard files — each still
      // commits a micro-batch, so the >=4/>=5 commit-log assertions
      // pass while the cross-batch state/watermark evidence silently
      // degenerates to an effective single-batch run. Fail LOUDLY at
      // the degenerate span instead (n bounded counts over the
      // checkpointed frame — driver-cheap).
      require(shard.count() > 0L,
        s"landAscendingShards degenerate split: shard $i of $n over " +
          s"$key range [${cuts(i)}, ${cuts(i + 1)}) is EMPTY " +
          s"(key span [$mn, $mx]) — the multi-batch evidence would " +
          "silently weaken; re-derive the shard cuts for this fixture")
      shard.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      val dest = new org.apache.hadoop.fs.Path(src, s"shard-$i.parquet")
      // fail LOUDLY here (the day-alignment-require rule): a silently
      // dropped shard would otherwise surface as an opaque oracle hash
      // mismatch or a commit-count assert far from the cause
      require(fs.rename(part, dest), s"shard rename failed: $part -> $dest")
      fs.delete(tmp, true)
      // the mtime value only needs to ORDER; absolute time is irrelevant
      fs.setTimes(dest, base + i * 60000L, -1)
    }
    (mn, mx)
  }

  val queries: Map[String, Q] = Map(
    "stream_file_ingest" -> ((s, d) => {
      val src = ScanQueries.scratch("stream_src", d)
      val ckp = ScanQueries.scratch("stream_ckp", d)
      val out = ScanQueries.scratch("stream_out", d)
      // fresh checkpoint + sink per invocation: the append sink would
      // otherwise see a drained checkpoint and emit nothing on re-run
      // (Bench/Golden re-run queries in one JVM)
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(ckp, out).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
      // ONE file ⇒ one data batch ⇒ watermark still unset while every
      // row aggregates (zero late drops, order-free)
      Tables.events(s, d).select("event_id", "event_type", "ts")
        .coalesce(1).write.mode("overwrite").parquet(src)
      val sch = s.read.parquet(src).schema
      // r12 ADVICE pin: the oracle's strict `(day+1)*864e8 <= m` eviction
      // test assumes max(ts) is never exactly day-aligned — if a fixture
      // regen (it happened at r6f) lands a day-aligned max(ts), the last
      // window sits on the strict-vs-inclusive watermark boundary and the
      // oracle could silently diverge from Spark's append emission. Fail
      // LOUDLY at the assumption instead of as an opaque hash mismatch.
      // (One-row bounded aggregate over the just-landed single file.)
      val mxUs = s.read.parquet(src)
        .agg(max(unix_micros(col("ts")))).head.getLong(0)
      require(mxUs % 86400000000L != 0,
        s"stream_file_ingest fixture assumption broken: max(ts)=$mxUs µs is " +
          "exactly day-aligned — the watermark eviction boundary is now " +
          "ambiguous; re-derive the oracle's strict/inclusive window test")
      val q = s.readStream.schema(sch).parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .selectExpr("event_type",
          "unix_micros(w.start) DIV 86400000000 AS day", "cnt")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckp).option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
        .select(col("event_type"), col("day"), col("cnt"))
        .orderBy("event_type", "day")
    }),

    // The CUSTOM-processor streaming ingest (r12) — stream_file_ingest
    // proves the built-in windowed aggregate in the oracled contract;
    // this declares a transformWithState execution: the documents shard
    // streamed through streaming.DedupProcessor (keyed RocksDB state,
    // first-seen exact dedup — the 19-processor family's flagship) into
    // a parquet sink, read back. ONE source file ⇒ one micro-batch ⇒
    // the smallest doc_id per content hash wins (the processor's
    // in-batch tie-break), which IS the batch
    // text_normalize_dedup_exact result — the oracle is that query's
    // SQL verbatim, so the green row is the stream-equals-batch proof.
    // transformWithState needs the RocksDB state store provider; the
    // conf is scoped to a newSession clone (runtime confs don't leak —
    // the join_bloom_filtered precedent).
    "stream_dedup_ingest" -> ((s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val src = ScanQueries.scratch("sdedup_src", d)
      val ckp = ScanQueries.scratch("sdedup_ckp", d)
      val out = ScanQueries.scratch("sdedup_out", d)
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(ckp, out).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
      Tables.documents(s, d).select("doc_id", "lang", "text")
        .coalesce(1).write.mode("overwrite").parquet(src)
      val sch = s.read.parquet(src).schema
      val q = graft.streaming.DedupProcessor
        .dedupStream(s.readStream.schema(sch).parquet(src))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckp).option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).select("doc_id", "lang", "h").orderBy("doc_id")
    }),

    // The CROSS-BATCH streaming ingest (r13 — the r12 verdict's "Next
    // round" #2): both r12 streaming queries are single-micro-batch by
    // construction, so cross-batch state lived only in StreamingSpec's
    // MemoryStream tests. Here the documents shard lands as FOUR
    // parquet files with ascending, DISJOINT doc_id ranges and strictly
    // ascending mtimes; the file source reads them under
    // maxFilesPerTrigger=1 (oldest-mtime-first — latestFirst defaults
    // false), so Trigger.AvailableNow runs 4 data micro-batches
    // through DedupProcessor's keyed RocksDB state — a hash seen in
    // batch 0 suppresses its later re-appearances ACROSS batches.
    // (No trailing no-data batch commits under TimeMode.None — there
    // is no watermark state to flush — so the commit log records
    // exactly one entry per shard; measured at landing.)
    // Determinism (the DedupProcessor arrival contract): a content
    // hash's FIRST delivering batch contains its globally-smallest
    // doc_id (ranges ascend with processing order), and within a batch
    // the processor keeps the min doc_id — so first-seen-across-batches
    // == the batch min-doc_id winner and the oracle is the batch dedup
    // SQL VERBATIM. StreamingSpec pins the commit log's batch count
    // (the multi-batch proof) and equality with the single-batch
    // stream_dedup_ingest result.
    "stream_dedup_multibatch" -> ((s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val src = ScanQueries.scratch("smb_src", d)
      val ckp = ScanQueries.scratch("smb_ckp", d)
      val out = ScanQueries.scratch("smb_out", d)
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(ckp, out).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      landAscendingShards(s, docs, "doc_id", src, 4)
      val sch = s.read.parquet(src).schema
      val q = graft.streaming.DedupProcessor
        .dedupStream(s.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(src))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckp).option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out).select("doc_id", "lang", "h").orderBy("doc_id")
    }),

    // WATERMARK ADVANCEMENT across batches in the oracled contract
    // (r13 — the other half of the r12 verdict's gap (a): cross-batch
    // STATE is stream_dedup_multibatch; this proves the time-semantics
    // side). The events shard lands as four single-file shards split by
    // ascending TS ranges; under maxFilesPerTrigger=1 the watermark
    // ratchets up after every micro-batch (max ts of batches seen so
    // far), so 1-day windows emit PROGRESSIVELY as the watermark passes
    // their ends, and a window that straddles a shard cut accumulates
    // counts across two batches in state before emitting — the real
    // continuous-ingest lifecycle, not a single-batch drain. Zero late
    // drops by construction: every row of shard i+1 has ts strictly
    // above the watermark (= max ts of shards <= i). The append sink
    // receives each window exactly once, whenever its end fell behind
    // the watermark, so the FINAL sink content is windows with
    // end <= global max ts — the same pure function of the data as
    // stream_file_ingest, whose oracle this reuses VERBATIM (intermediate
    // emission timing is invisible in the final set). StreamingSpec pins
    // >= 5 commit-log batches (4 data + the no-data flush) and a
    // NONEMPTY intermediate emission (progress proof: some window
    // committed before the last data batch).
    "stream_window_multibatch" -> ((s, d) => {
      val src = ScanQueries.scratch("swm_src", d)
      val ckp = ScanQueries.scratch("swm_ckp", d)
      val out = ScanQueries.scratch("swm_out", d)
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(ckp, out).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
        col("ts"), unix_micros(col("ts")).as("us"))
      val (_, mxUs) = landAscendingShards(s, ev, "us", src, 4)
      // same fixture assumption as stream_file_ingest: a day-aligned
      // max(ts) would sit on the strict-vs-inclusive eviction boundary
      require(mxUs % 86400000000L != 0,
        s"stream_window_multibatch fixture assumption broken: max(ts)=$mxUs µs " +
          "is exactly day-aligned — re-derive the oracle's window cutoff")
      val sch = s.read.parquet(src).schema
      val q = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .selectExpr("event_type",
          "unix_micros(w.start) DIV 86400000000 AS day", "cnt")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckp).option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
        .select(col("event_type"), col("day"), col("cnt"))
        .orderBy("event_type", "day")
    }),

    // STREAMING SESSIONIZATION in the oracled contract (r14 — the r13
    // verdict's "Next round" #2): the events stream lands as four
    // ascending ts-range shards (landAscendingShards — the shared
    // multi-batch recipe, which also guarantees the per-user
    // time-ascending-ACROSS-batches arrival contract), drains one file
    // per micro-batch through streaming.SessionSnapshotProcessor
    // (transformWithState, RocksDB ValueState holding each user's OPEN
    // session across batches), and the append sink's snapshots resolve
    // via SessionProcessor.resolveSessionSnapshots — ONE commutative
    // idempotent max-struct fold per (user, sess_start).
    //
    // Why snapshots, not the event-time-timer flush: a trailing open
    // session whose end exceeds the final watermark NEVER flushes (the
    // timer fires only when the watermark passes openLast+gap, and
    // AvailableNow's watermark stops at max(ts)) — so a timer-flushed
    // append sink is structurally missing each user's last session and
    // can never equal the batch result. Upsert snapshots + the fold
    // consumer make the resolved set EXACTLY the batch session_window
    // result (a session's start is pinned by its first event under the
    // ascending arrival contract; every extension re-emits the same key
    // with a strictly larger n_events) — so the oracle is ts_session's
    // gaps-and-islands SQL VERBATIM at exact-cents grain (zero FP:
    // per-event cents are floor(value*100+0.5) in identical IEEE ops on
    // both engines, summed as integers). StreamingSpec pins >= 4
    // commit-log batches, a session whose snapshots appear in >= 2
    // batches (a session is emitted at most once per batch, so raw-sink
    // multiplicity >= 2 proves held state crossed a batch boundary),
    // and equality with the batch session_window aggregate (the
    // independent spelling).
    "stream_session_multibatch" -> ((s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val src = ScanQueries.scratch("ssess_src", d)
      val ckp = ScanQueries.scratch("ssess_ckp", d)
      val out = ScanQueries.scratch("ssess_out", d)
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(ckp, out).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("value"), unix_micros(col("ts")).as("us"))
      landAscendingShards(s, ev, "us", src, 4)
      val sch = s.read.parquet(src).schema
      import s.implicits._
      val stream = s.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.Streams.Ev]
      val q = graft.streaming.SessionProcessor.sessionizeSnapshots(stream, 30)
        .toDF()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckp).option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.SessionProcessor
        .resolveSessionSnapshots(s.read.parquet(out))
        .orderBy("user_id", "sess_start")
    }))

  /** The emitted window set = windows with end <= final watermark
    * (= max ts): (day + 1) · 86 400 000 000 µs <= epoch_us(max(ts)).
    * ONE definition for both the single-batch and the multi-batch
    * ingest (the multi-batch run's progressive emission lands the same
    * final set — that identity IS the cross-batch proof). A def: the
    * one-definition rule (a hand-synced copy that drifts would still
    * parse and run — the silent-divergence failure the convention
    * exists to prevent). */
  private def ingestWindowOracle: String =
    """WITH mx AS (SELECT epoch_us(max(ts)) AS m FROM events),
       g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events)
       SELECT event_type, day, count(*) AS cnt
       FROM g, mx
       WHERE (day + 1) * 86400000000 <= m
       GROUP BY event_type, day
       ORDER BY event_type, day"""

  /** text_normalize_dedup_exact's oracle VERBATIM (min doc_id per
    * normalized content hash) — ONE definition for both dedup ingests:
    * single-batch (in-batch min-doc_id tie-break == batch winner) and
    * multi-batch (ascending disjoint shards + first-seen keyed state
    * == batch min-doc_id). */
  private def dedupIngestOracle: String =
    "WITH n AS (SELECT doc_id, lang, " +
      "sha256(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS h FROM documents) " +
      "SELECT doc_id, lang, h FROM n " +
      "WHERE doc_id IN (SELECT MIN(doc_id) FROM n GROUP BY h) ORDER BY doc_id"

  val oracle: Map[String, String] = Map(
    "stream_file_ingest" -> ingestWindowOracle,
    "stream_dedup_ingest" -> dedupIngestOracle,
    "stream_dedup_multibatch" -> dedupIngestOracle,
    "stream_window_multibatch" -> ingestWindowOracle,
    // ts_session's gaps-and-islands SQL verbatim (TemporalQueries), at
    // exact-cents grain: the resolved snapshot set == the batch session
    // census INCLUDING each user's trailing open session — the proof
    // the timer-flush shape cannot give an append sink (see the query
    // comment). Session end is half-open [first, last+gap): an event at
    // exactly prev+gap opens a NEW session (`>= INTERVAL 30 MINUTE`,
    // matching Streams.foldSessions' `>= gapUs`).
    "stream_session_multibatch" ->
      ("WITH marked AS (SELECT user_id, ts, value, " +
       "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
       "sess AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM marked) " +
       "SELECT user_id, MIN(ts) AS sess_start, MAX(ts) + INTERVAL 30 MINUTE AS sess_end, " +
       "COUNT(*) AS n_events, " +
       "CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents " +
       "FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start"))
}
