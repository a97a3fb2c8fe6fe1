package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Streaming semantics (SURVEY §5.2.4): batch/stream parity, watermark
  * late-data drop, stateful dedup, and custom-state sessionization. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling agg: file-stream (AvailableNow) equals batch on the same data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val batchEvents = Tables.events(spark, sf).select("ts", "event_type")
    batchEvents.write.mode("overwrite").parquet(dir)

    val expected = Streams.tumblingCounts(batchEvents)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)
    val q = Streams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("tumbling_parity")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "query must finish within the timeout")
    val got = spark.table("tumbling_parity")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("stream_file_ingest (declared) equals the batch tumbling aggregate") {
    // r12: the declared streaming query's read-back must equal the same
    // aggregate computed as a BATCH frame under the withheld-window rule
    // (windows with end <= max ts emit; the last partial day never
    // does). Independent spelling: day derived from ts directly, not
    // from window.start, and the cutoff applied as a literal.
    val got = SparkEntry.queries("stream_file_ingest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) DIV 86400000000 AS day",
        "unix_micros(ts) AS us")
    val mx = ev.agg(max("us")).head.getLong(0)
    val expected = ev.where(expr(s"(day + 1) * 86400000000 <= ${mx}L"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got === expected)
    // prove a real MicroBatchExecution ran (the returned frame is the
    // sink READ-BACK, so its own plan is a parquet scan — the streaming
    // evidence is the checkpoint's commit log): >= 2 committed batches
    // (the data batch + the no-data watermark-flush batch).
    val ckp = graft.queries.ScanQueries.scratch("stream_ckp", sf)
    val commits = new java.io.File(s"$ckp/commits").list()
    assert(commits != null && commits.count(!_.endsWith(".crc")) >= 2,
      "checkpoint commit log must record the data batch and the no-data flush batch")
  }

  test("stream_dedup_ingest (declared) equals the batch exact-dedup query") {
    // r12: the declared transformWithState ingest must reproduce the
    // batch text_normalize_dedup_exact result row-for-row (one source
    // file ⇒ one micro-batch ⇒ the processor's in-batch min-doc_id
    // tie-break IS the batch winner rule).
    val got = SparkEntry.queries("stream_dedup_ingest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val exp = SparkEntry.queries("text_normalize_dedup_exact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got.nonEmpty && got === exp)
  }

  test("stream_dedup_multibatch (declared): >= 4 data batches; equals the single-batch ingest") {
    // r13 (the r12 verdict #2): cross-batch keyed state in the oracled
    // contract — the multi-batch run must reproduce the single-batch
    // result EXACTLY (first-seen across ascending shards == in-batch
    // min-doc_id == batch dedup), and the checkpoint commit log must
    // prove the source really was drained one file per micro-batch.
    val got = SparkEntry.queries("stream_dedup_multibatch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val single = SparkEntry.queries("stream_dedup_ingest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got.nonEmpty && got === single,
      "cross-batch dedup must equal the single-batch (== batch SQL) result")
    val ckp = graft.queries.ScanQueries.scratch("smb_ckp", sf)
    val commits = new java.io.File(s"$ckp/commits").list()
    val n = if (commits == null) 0 else commits.count(!_.endsWith(".crc"))
    assert(n >= 4,
      s"commit log must record >= 4 committed micro-batches (one per shard), got $n")
  }

  test("stream_window_multibatch (declared): watermark ratchets across batches; final set equals single-batch") {
    // r13: the time-semantics half of the cross-batch proof — the
    // 4-shard progressive run must land EXACTLY the single-batch
    // stream_file_ingest window set (append-mode windows emit once,
    // whenever the advancing watermark passes their end), the commit
    // log must show one batch per shard plus the no-data flush, and
    // the sink's per-batch metadata must show windows were emitted in
    // at least two DIFFERENT batches (the progressive-emission proof —
    // a single-batch drain cannot produce that).
    val got = SparkEntry.queries("stream_window_multibatch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val single = SparkEntry.queries("stream_file_ingest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got === single,
      "progressive multi-batch emission must equal the single-batch window set")
    val ckp = graft.queries.ScanQueries.scratch("swm_ckp", sf)
    val commits = new java.io.File(s"$ckp/commits").list()
    val n = if (commits == null) 0 else commits.count(!_.endsWith(".crc"))
    assert(n >= 5,
      s"commit log must record >= 5 micro-batches (4 data + no-data flush), got $n")
    val out = graft.queries.ScanQueries.scratch("swm_out", sf)
    val meta = new java.io.File(s"$out/_spark_metadata").listFiles()
    val emittingBatches = meta.filter(f => f.getName.forall(_.isDigit))
      .count(f => new String(java.nio.file.Files.readAllBytes(f.toPath))
        .contains("\"path\""))
    assert(emittingBatches >= 2,
      s"windows must emit in >= 2 distinct batches (got $emittingBatches) — " +
        "the watermark-advancement evidence")
  }

  test("stream_session_multibatch (declared): cross-batch session state; resolved set equals batch session_window") {
    // r14 (the r13 verdict #2): sessionization state in the oracled
    // contract. The oracle is the gaps-and-islands SQL; the INDEPENDENT
    // spelling here is Spark's built-in session_window aggregate at the
    // same exact-cents grain. The cross-batch proof: foldSessions emits
    // each session AT MOST ONCE per handleInputRows call (it is either
    // in the closed list or the open tail), so a (user, sess_start) key
    // appearing >= 2 times in the RAW sink means its open-session state
    // was HELD in RocksDB across a batch boundary and re-emitted by a
    // later batch (re-closed by a gap-proving event, or extended).
    // A straddling-session distinct-n assert was measured too fragile:
    // at fixture density almost no 30-min session happens to straddle
    // one of the 3 time cuts — but nearly every USER has events in >= 2
    // shards, so re-emission is dense.
    val got = SparkEntry.queries("stream_session_multibatch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), r.getLong(4))).toSeq
    val exp = Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")).as("sum_cents"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"), col("sum_cents"))
      .orderBy("user_id", "sess_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty && got === exp,
      "resolved snapshot set must equal the batch session_window census")
    val ckp = graft.queries.ScanQueries.scratch("ssess_ckp", sf)
    val commits = new java.io.File(s"$ckp/commits").list()
    val n = if (commits == null) 0 else commits.count(!_.endsWith(".crc"))
    assert(n >= 4,
      s"commit log must record >= 4 committed micro-batches (one per shard), got $n")
    val out = graft.queries.ScanQueries.scratch("ssess_out", sf)
    val reEmitted = spark.read.parquet(out)
      .groupBy("user_id", "sess_start")
      .agg(count(lit(1)).as("k"))
      .where(col("k") >= 2).count()
    assert(reEmitted > 0,
      "no session was re-emitted by a later batch — the cross-batch state " +
        "evidence degenerated (did the fixture's user/shard geometry change?)")
  }

  test("watermark drops late rows beyond the delay (append mode)") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "event_type")
    val q = Streams.tumblingCountsWatermarked(df, "10 minutes")
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append")
      .start()

    // Window 10:00 gets 2 events; the 12:30 event advances the watermark
    // to 12:20, finalizing (and emitting) the 10:00 window.
    input.addData((ts("2024-01-01 10:10:00"), "a"), (ts("2024-01-01 10:50:00"), "a"),
      (ts("2024-01-01 12:30:00"), "a"))
    q.processAllAvailable()
    // Late row for 10:00 (behind the 12:20 watermark) must be dropped;
    // 12:40 keeps the stream moving.
    input.addData((ts("2024-01-01 10:20:00"), "a"), (ts("2024-01-01 12:40:00"), "a"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 15:00:00"), "a"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_test")
      .collect().map(r => (r.getTimestamp(0), r.getLong(2))).toMap
    assert(rows(ts("2024-01-01 10:00:00")) === 2L,
      "late row must not be re-counted into the finalized 10:00 window")
  }

  test("dropDuplicatesWithinWatermark dedups replayed events") {
    val input = MemoryStream[(Long, Timestamp)](spark)
    val df = input.toDF().toDF("event_id", "ts")
    val q = Streams.dedupWithinWatermark(df, "10 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append")
      .start()
    input.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    // replay event 1 within the watermark — must be suppressed
    input.addData((1L, ts("2024-01-01 10:02:00")), (3L, ts("2024-01-01 10:03:00")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_test").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState sessionization equals session_window (batch spec)") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).as[Streams.Ev]
    val custom = Streams.sessionize(evs, 30)
      .collect()
      .map(s => (s.user_id, s.sess_start, s.sess_end, s.n_events))
      .toSet
    val builtin = SparkEntry.queries("ts_session")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(custom === builtin)
  }

  test("file sink + checkpoint: restart resumes exactly-once (no dup rows)") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_fs_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fs_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_fs_ck").toString
    val schema = Tables.events(spark, sf).select("event_id", "event_type").schema

    def startQuery() = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()

    // batch 1
    Tables.events(spark, sf).select("event_id", "event_type")
      .where(col("event_id") < 500).write.mode("append").parquet(srcDir)
    val q1 = startQuery(); assert(q1.awaitTermination(60000))
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 === 500L)

    // batch 2 lands AFTER the first query stopped; restart from checkpoint
    Tables.events(spark, sf).select("event_id", "event_type")
      .where(col("event_id") >= 500 && col("event_id") < 800)
      .write.mode("append").parquet(srcDir)
    val q2 = startQuery(); assert(q2.awaitTermination(60000))

    val out = spark.read.parquet(outDir)
    assert(out.count() === 800L, "restart must process only the new files")
    assert(out.groupBy("event_id").count().where(col("count") > 1).count() === 0,
      "no event may be written twice across restarts")
  }

  test("stream-static dimension join + aggregation equals the batch join") {
    // the enrichment shape every land-time pipeline runs: a streaming
    // fact joined per micro-batch against a STATIC dimension table (the
    // dim is re-read/broadcast each batch — no state, no watermark
    // needed), then aggregated in complete mode. Parity: the final
    // per-segment totals equal the batch join on the same data,
    // regardless of how the stream is sliced.
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val evCols = Seq("user_id", "event_id")
    val ev = Tables.events(spark, sf).select(evCols.map(col): _*)
    val expected = ev.join(dim, "user_id")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1)))
    val batches = Seq(rows.slice(0, rows.length / 3),
      rows.slice(rows.length / 3, rows.length))
    val input = MemoryStream[(Long, Long)](spark)
    val joined = input.toDF().toDF(evCols: _*)
      .join(dim, "user_id")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val q = joined.writeStream.format("memory").queryName("dim_join")
      .outputMode("complete").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("dim_join").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture users must hit the dimension")
    assert(got === expected,
      "stream-static join totals must equal the batch join")
  }

  test("stream-stream inner join within event-time bounds") {
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val buys = MemoryStream[(Long, Timestamp)](spark)
    val c = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "10 minutes")
    val b = buys.toDF().toDF("buy_user", "buy_ts").withWatermark("buy_ts", "10 minutes")
    // attribute a purchase to a click up to 30 minutes earlier
    val q = c.join(b,
        col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append")
      .start()
    clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00")))
    buys.addData((1L, ts("2024-01-01 10:20:00"))) // within 30 min of click -> joins
    q.processAllAvailable()
    buys.addData((2L, ts("2024-01-01 11:00:00"))) // 55 min after click -> no join
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join").collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(1L), s"got ${rows.mkString(",")}")
  }

  test("transformWithState sessionization equals session_window (batch spec)") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).as[graft.streaming.Streams.Ev]
    val tws = graft.streaming.SessionProcessor.sessionize(evs, 30)
      .collect()
      .map(s => (s.user_id, s.sess_start, s.sess_end, s.n_events))
      .toSet
    val builtin = SparkEntry.queries("ts_session")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(tws === builtin)
  }

  test("sessionizeStream holds open sessions across micro-batches (no split)") {
    val input = MemoryStream[(Long, Timestamp, Double)](spark)
    val df = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 minute")
    import org.apache.spark.sql.Encoders
    val evs = df.as[graft.streaming.Streams.Ev](Encoders.product)
    val q = graft.streaming.Streams.sessionizeStream(evs, 30)
      .writeStream.format("memory").queryName("sess_incr")
      .outputMode("append")
      .start()
    // one session whose events STRADDLE two micro-batches
    input.addData((7L, ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    input.addData((7L, ts("2024-01-01 10:10:00"), 2.0))
    q.processAllAvailable()
    // advance the watermark far past 10:40 so the timeout flushes the session
    input.addData((99L, ts("2024-01-01 12:00:00"), 0.0))
    q.processAllAvailable()
    input.addData((99L, ts("2024-01-01 14:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val sess7 = spark.table("sess_incr")
      .where(col("user_id") === 7L)
      .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getLong(4)))
    assert(sess7.toSeq === Seq((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L, 300L)),
      s"one merged session expected, got: ${sess7.mkString(", ")}")
  }

  test("timer-based transformWithState sessionization equals fMGWS under the same replay") {
    // transformWithState requires the RocksDB state store provider in
    // streaming mode; scope it to this query and restore after.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.Encoders
      // identical replay fed to both engines: a session straddling two
      // micro-batches, then watermark advances (12:00, 14:00) so the
      // event-time timer / EventTimeTimeout flushes the open tail.
      val batches = Seq(
        Seq((7L, ts("2024-01-01 10:00:00"), 1.0)),
        Seq((7L, ts("2024-01-01 10:10:00"), 2.0)),
        Seq((99L, ts("2024-01-01 12:00:00"), 0.5)),
        Seq((99L, ts("2024-01-01 14:00:00"), 0.25)))
      type DS[T] = org.apache.spark.sql.Dataset[T]
      def run(name: String,
          f: DS[graft.streaming.Streams.Ev] => DS[graft.streaming.Streams.SessionOut]) = {
        val input = MemoryStream[(Long, Timestamp, Double)](spark)
        val evs = input.toDF().toDF("user_id", "ts", "value")
          .withWatermark("ts", "1 minute")
          .as[graft.streaming.Streams.Ev](Encoders.product)
        val q = f(evs).writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        q.stop()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
            r.getLong(3), r.getLong(4))).toSet
      }
      val tws = run("sess_tws_timer",
        graft.streaming.SessionProcessor.sessionizeStream(_, 30))
      val fmgws = run("sess_fmgws_ref",
        graft.streaming.Streams.sessionizeStream(_, 30))
      assert(tws === fmgws, "timer-based transformWithState must match fMGWS")
      assert(tws.contains((7L, ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:40:00"), 2L, 300L)),
        s"user 7's straddling session must flush via the timer; got $tws")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState state SURVIVES a query restart from checkpoint") {
    // The fault-tolerance claim behind every processor in
    // graft.streaming: keyed RocksDB state is durable across query
    // restarts. Phase 1 delivers half the corpus and STOPS the query;
    // phase 2 starts a NEW query from the same checkpoint and feeds a
    // full REPLAY of phase 1 plus the remaining docs. If state
    // recovered, the replay emits nothing (every hash already known)
    // and the final sink equals the batch dedup; if state were lost,
    // phase-1 docs would re-emit and doc_ids would duplicate.
    withRocksDB {
      val docs = Tables.documents(spark, sf)
        .select("doc_id", "lang", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      val Array(b1, b2) = docs.grouped((docs.length + 1) / 2).toArray
      val outDir = java.nio.file.Files.createTempDirectory("graft_tws_out").toString
      val ckDir = java.nio.file.Files.createTempDirectory("graft_tws_ck").toString
      val input = MemoryStream[(Long, String, String)](spark)
      val stream = graft.streaming.DedupProcessor.dedupStream(
        input.toDF().toDF("doc_id", "lang", "text"))
      def startQ() = stream.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
      // phase 1
      input.addData(b1.toSeq: _*)
      val q1 = startQ(); q1.processAllAvailable(); q1.stop()
      val n1 = spark.read.parquet(outDir).count()
      assert(n1 > 0L, "phase 1 must land survivors")
      // phase 2: restart from checkpoint, replay phase 1 + the rest
      input.addData(b1.toSeq: _*)
      input.addData(b2.toSeq: _*)
      val q2 = startQ(); q2.processAllAvailable(); q2.stop()
      val out = spark.read.parquet(outDir)
      assert(out.groupBy("doc_id").count().where(col("count") > 1).count() === 0,
        "a phase-1 survivor re-emitted after restart — state was lost")
      val got = out.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val expected = SparkEntry.queries("text_normalize_dedup_exact")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === expected,
        "post-restart survivors must equal the batch dedup of the full corpus")
    }
  }

  test("transformWithState incremental exact-dedup equals the batch dedup under replay") {
    // the streaming face of text_normalize_dedup_exact (r4 verdict ask #2):
    // same content-hash definition, first-seen survivor, replay-safe state.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = Tables.documents(spark, sf)
        .select("doc_id", "lang", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      // three id-ascending micro-batches — the land-time incremental shape
      // under which first-seen == the batch min-doc_id winner
      val batches = docs.grouped((docs.length + 2) / 3).toSeq
      val input = MemoryStream[(Long, String, String)](spark)
      val stream = graft.streaming.DedupProcessor.dedupStream(
        input.toDF().toDF("doc_id", "lang", "text"))
      val q = stream.writeStream.format("memory").queryName("dedup_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val afterAll = spark.table("dedup_incr").count()
      // REPLAY batch 1 in full: every hash is in state -> nothing new
      input.addData(batches.head: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("dedup_incr").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(spark.table("dedup_incr").count() === afterAll,
        "replaying a delivered batch must emit nothing (replay-safe state)")
      val expected = SparkEntry.queries("text_normalize_dedup_exact")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === expected,
        "streaming survivors must equal the batch dedup on the same replay")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("stream-stream interval join equals the batch join on the same data") {
    // the two-stream face of join_range: purchases attributed to a view by
    // the same user within the next 30 minutes — event-time interval join
    // with watermarks on BOTH sides (the state-cleanup contract: Spark can
    // drop buffered rows once the watermark passes the interval bound).
    val ev = Tables.events(spark, sf).select("user_id", "event_type", "ts", "event_id")
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("vts"), col("event_id").as("vid"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"), col("event_id").as("pid"))
    val cond = "v_user = p_user AND pts >= vts AND pts <= vts + interval 30 minutes"
    val expected = views.join(purchases, expr(cond))
      .select("vid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must contain attributable purchases")

    val vIn = MemoryStream[(Long, Timestamp, Long)](spark)
    val pIn = MemoryStream[(Long, Timestamp, Long)](spark)
    val vS = vIn.toDF().toDF("v_user", "vts", "vid").withWatermark("vts", "1 hour")
    val pS = pIn.toDF().toDF("p_user", "pts", "pid").withWatermark("pts", "1 hour")
    val q = vS.join(pS, expr(cond)).select("vid", "pid")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    vIn.addData(views.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))): _*)
    pIn.addData(purchases.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected, "stream-stream interval join must equal the batch join")
  }

  test("streaming token-budget admission equals the batch sampler under hash-ordered arrival") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // deliver the corpus in the batch query's selection order (global
      // (hk, doc_id) sort keeps every per-source subsequence hash-ordered),
      // split into three uneven micro-batches
      val docs = graft.streaming.BudgetProcessor.withBudgetCols(
        Tables.documents(spark, sf).select("doc_id", "source", "text"))
        .collect().sortBy(d => (d.hk, d.doc_id))
      val withText = Tables.documents(spark, sf)
        .select("doc_id", "source", "text").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      val ordered = docs.map(d => (d.doc_id, withText(d.doc_id)._1, withText(d.doc_id)._2))
      val batches = Seq(ordered.take(40), ordered.slice(40, 180), ordered.drop(180))
      val input = MemoryStream[(Long, String, String)](spark)
      val stream = graft.streaming.BudgetProcessor.admitStream(
        input.toDF().toDF("doc_id", "source", "text"))
      val q = stream.writeStream.format("memory").queryName("budget_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table("budget_incr").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
      val expected = SparkEntry.queries("sample_token_budget")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
      assert(got === expected,
        "hash-ordered streaming admission must reproduce the batch selection, cum_before included")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming LSH index emits the batch candidate pair set under any batching") {
    // the state store as an incremental LSH index: candidate SET parity
    // with the batch text_minhash_lsh join, independent of arrival order
    // (bucket membership is order-free — no id-ascending assumption here).
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = Tables.documents(spark, sf)
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // deliberately NOT id-sorted: reverse order, split unevenly
      val shuffled = docs.sortBy(-_._1)
      val batches = Seq(shuffled.take(50), shuffled.slice(50, 300), shuffled.drop(300))
      val input = MemoryStream[(Long, String, String)](spark)
      val stream = graft.streaming.LshIndexProcessor.candidatePairsStream(
        input.toDF().toDF("doc_id", "source", "text"))
      val q = stream.writeStream.format("memory").queryName("lsh_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table("lsh_incr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = SparkEntry.queries("text_minhash_lsh")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected,
        s"incremental candidates != batch: extra=${got.diff(expected).take(5)} " +
          s"missing=${expected.diff(got).take(5)}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming sequence-gap monitor equals the batch census under reversed batching") {
    // r11 (18th processor): exact per-day distinct via 63-bit bucket
    // bitmaps — OR is commutative AND idempotent, min/max folds too, so
    // the resolved census is order-free. Fed the SAME planted lossy
    // frame PropertySpec proves the batch detectors on (gaps, an
    // intra-batch replay row, an out-of-order day range), REVERSED and
    // split unevenly; parity against the batch sequenceGapCensus'
    // per-day facts, with the cross-day overlap column derived
    // consumer-side from the resolved ranges exactly as batch does.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def rows(day: Long, ids: Seq[Long]) = ids.map(i => (i, day * 86400L))
      val planted = (rows(0, 0L to 9L) ++
        rows(1, Seq(10L, 11L, 12L, 14L, 15L, 15L, 16L, 18L, 19L)) ++
        rows(2, 18L to 25L))
      val shuffled = planted.reverse
      val batches = Seq(shuffled.take(7), shuffled.slice(7, 20), shuffled.drop(20))
      val input = MemoryStream[(Long, Long)](spark)
      val stream = graft.streaming.SeqGapProcessor.cellStream(
        input.toDF().toDF("event_id", "secs")
          .select(col("event_id"), timestamp_seconds(col("secs")).as("ts")))
      val q = stream.writeStream.format("memory").queryName("seqgap_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val resolved = graft.streaming.SeqGapProcessor
        .resolveDaily(spark.table("seqgap_incr")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))))
      val batchDf = graft.queries.CdcQueries.sequenceGapCensus(
        planted.toDF("event_id", "secs")
          .select(col("event_id"), timestamp_seconds(col("secs")).as("ts")))
      val expected = batchDf.collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))))
      assert(resolved.toMap === expected.toMap,
        "resolved per-day census must equal the batch census facts")
      // consumer-side overlap derivation from the resolved ranges ==
      // the batch column (the cross-day join is the consumer's job)
      val ranges = resolved.map { case (d, f) => (d, f._3, f._4) }
      val expOverl = batchDf.collect().map(r => r.getLong(0) -> r.getLong(7)).toMap
      val gotOverl = ranges.map { case (d, mn, mx) =>
        d -> ranges.count { case (d2, mn2, mx2) => d2 < d && mx2 >= mn && mn2 <= mx }.toLong
      }.toMap
      assert(gotOverl === expOverl, "derived overlap column must match batch")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming star-edge index resolves to the batch star set under reversed batching") {
    // r11 (r10 verdict ask #5): the incremental face of the star-edge
    // candidate graph the CC-family cluster queries consume. The
    // processor emits (bucket, member, center) UPSERT rows — re-pointing
    // residents when a smaller center arrives — and the consumer's
    // commutative min(center) fold resolves the FINAL star set, so edge
    // SET parity with the batch minhashStarEdgesOver holds under any
    // order (fed reversed + uneven here, the LshIndexProcessor class).
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = Tables.documents(spark, sf)
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // reversed order: every bucket's true center arrives LAST, forcing
      // the re-emission path in (almost) every bucket
      val shuffled = docs.sortBy(-_._1)
      val batches = Seq(shuffled.take(50), shuffled.slice(50, 300), shuffled.drop(300))
      val input = MemoryStream[(Long, String, String)](spark)
      val stream = graft.streaming.StarEdgeProcessor.assignStream(
        input.toDF().toDF("doc_id", "source", "text"))
      val q = stream.writeStream.format("memory").queryName("star_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = graft.streaming.StarEdgeProcessor
        .resolveEdges(spark.table("star_incr")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batchDocs = Tables.documents(spark, sf)
      val expected = graft.queries.TextQueries.minhashStarEdgesOver(
          graft.queries.TextQueries.minhashBuckets(batchDocs)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected,
        s"resolved star set != batch: extra=${got.diff(expected).take(5)} " +
          s"missing=${expected.diff(got).take(5)}")
      // and the delta-involving subset — what dedup_cluster_incremental's
      // second stage consumes — matches the same shared-watermark filter
      // applied to the batch generator (the edges feeding the contraction)
      val bounds = batchDocs.agg(min("doc_id"), max("doc_id")).head()
      val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
      val wm = mn + ((mx - mn) * 4) / 5
      val gotDelta = got.filter(e => e._1 > wm || e._2 > wm)
      val expDelta = expected.filter(e => e._1 > wm || e._2 > wm)
      assert(gotDelta === expDelta && gotDelta.nonEmpty,
        "delta-stage edge subset must match (and be exercised)")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("split assignment on a stream equals the batch split (land-time curation)") {
    // The sampling dialect is stateless and row-local, so split/sample
    // decisions can be stamped at land time on each incremental batch —
    // and MUST agree with a batch recompute (SampleSpec proves subset-
    // stability; this proves the streaming surface runs the same dialect).
    val dir = java.nio.file.Files.createTempDirectory("graft_split_stream").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
      .withColumn("split", graft.queries.SampleQueries.splitCol(col("doc_id")))
    val q = stream.writeStream.format("memory").queryName("split_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "query must finish within the timeout")
    val streamed = spark.table("split_stream")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = SparkEntry.queries("split_train_test")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(streamed === batch, "stream-assigned splits must equal the batch dialect")
  }

  test("streaming session_window matches the batch session computation") {
    val input = MemoryStream[(Long, Timestamp, Double)](spark)
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = df.withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"))
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append")
      .start()
    input.addData((7L, ts("2024-01-01 10:00:00"), 1.0), (7L, ts("2024-01-01 10:10:00"), 1.0))
    q.processAllAvailable()
    // gap > 30 min: closes the first session once the watermark passes
    input.addData((7L, ts("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    input.addData((7L, ts("2024-01-01 14:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_stream")
      .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(rows.contains((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L)),
      s"got: ${rows.mkString(", ")}")
  }

  /** transformWithState needs the RocksDB provider (CLAUDE.md r3 note);
    * scoped per-test so the rest of the suite keeps the default. */
  private def withRocksDB(body: => Unit): Unit = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState incremental OHLC equals batch ts_ohlc under REVERSED batching") {
    // the streaming face of ts_ohlc (r5 verdict ask #3). The candle fold
    // is commutative (min/max/count only), so unlike the dedup/transition
    // processors arrival order must NOT matter: feed the batches reversed
    // (latest time slice first) and still demand exact batch parity.
    withRocksDB {
      val rows = Tables.events(spark, sf)
        .select("event_type", "ts", "event_id", "value").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (Streams.toUs(t._2), t._3))
      val batches = rows.grouped((rows.length + 3) / 4).toSeq.reverse
      val input = MemoryStream[(String, Timestamp, Long, Double)](spark)
      val stream = graft.streaming.OhlcProcessor.ohlcStream(
        input.toDF().toDF("event_type", "ts", "event_id", "value"))
      val q = stream.writeStream.format("memory").queryName("ohlc_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // every batch that delivers rows for a key re-emits the updated
      // candle with a strictly larger n — the max-n row per key is final
      val got = spark.table("ohlc_incr").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5),
          r.getDouble(8), r.getDouble(9), r.getDouble(10)))
        .groupBy(c => (c._1, c._2)).values.map(_.maxBy(_._3))
        .map(c => (c._1, Streams.fromUs(c._2), c._3, c._4, c._7, c._6, c._5))
        .toSet // (event_type, hr, n, open, high, low, close)
      val expected = SparkEntry.queries("ts_ohlc")(spark, sf).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .toSet
      assert(got === expected,
        "final streamed candles must equal the batch OHLC under any arrival order")
    }
  }

  test("transformWithState incremental transitions equal batch ts_transition_matrix under uneven slices") {
    // the streaming face of ts_transition_matrix (r5 verdict ask #3):
    // per-user lag chained through ValueState. Arrival contract: the
    // global (ts, event_id)-ascending feed — per-user ascending follows —
    // sliced UNEVENLY so pairs must chain across batch boundaries.
    withRocksDB {
      val rows = Tables.events(spark, sf)
        .select("user_id", "event_type", "ts", "event_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
        .sortBy(t => (Streams.toUs(t._3), t._4))
      val batches = Seq(rows.slice(0, rows.length / 5),
        rows.slice(rows.length / 5, rows.length / 2),
        rows.slice(rows.length / 2, rows.length))
      val input = MemoryStream[(Long, String, Timestamp, Long)](spark)
      val stream = graft.streaming.TransitionProcessor.transitionStream(
        input.toDF().toDF("user_id", "event_type", "ts", "event_id"))
      val q = stream.writeStream.format("memory").queryName("trans_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table("trans_incr").groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val expected = SparkEntry.queries("ts_transition_matrix")(spark, sf)
        .select("from_type", "to_type", "n").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(expected.nonEmpty, "fixture must contain transitions")
      assert(got === expected,
        "streamed transition counts must equal the batch matrix")
    }
  }

  test("transformWithState incremental gaps equal batch ts_interarrival under uneven slices") {
    // the streaming face of ts_interarrival: per-user lag chained
    // through ValueState; the log2 bucket histogram is consumer-side.
    // Same arrival contract as transitions: global (ts, event_id)
    // ascending, sliced unevenly so gaps must chain across batches.
    withRocksDB {
      val rows = Tables.events(spark, sf)
        .select("user_id", "ts", "event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
        .sortBy(t => (Streams.toUs(t._2), t._3))
      val batches = Seq(rows.slice(0, rows.length / 6),
        rows.slice(rows.length / 6, rows.length / 2),
        rows.slice(rows.length / 2, rows.length))
      val input = MemoryStream[(Long, Timestamp, Long)](spark)
      val stream = graft.streaming.InterarrivalProcessor.gapStream(
        input.toDF().toDF("user_id", "ts", "event_id"))
      val q = stream.writeStream.format("memory").queryName("gap_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // consumer-side histogram: bucket = binary string length of the gap
      val got = spark.table("gap_incr").collect().map(_.getLong(1))
        .groupBy(g => math.max(64 - java.lang.Long.numberOfLeadingZeros(g), 1))
        .map { case (b, gs) => (b, gs.size.toLong, gs.min, gs.max) }.toSet
      val expected = SparkEntry.queries("ts_interarrival")(spark, sf).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(expected.nonEmpty, "fixture must contain gaps")
      assert(got === expected,
        "streamed gap histogram must equal the batch ts_interarrival")
    }
  }

  test("transformWithState heavy hitters: exact batch parity below capacity, REVERSED batches") {
    // with distinct tokens per source <= k the Misra-Gries sketch never
    // evicts, the fold is pure increments (commutative) — any batching
    // must reproduce the exact per-source token counts
    withRocksDB {
      val docs = Tables.documents(spark, sf).select("source", "text").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      val batches = docs.grouped((docs.length + 2) / 3).toSeq.reverse
      val input = MemoryStream[(String, String)](spark)
      val stream = graft.streaming.HeavyHitterProcessor.hitterStream(
        input.toDF().toDF("source", "text"), 64)
      val q = stream.writeStream.format("memory").queryName("hh_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // max-n rows per source are the final sketch
      val all = spark.table("hh_incr").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val got = all.groupBy(_._1).values.flatMap { rs =>
        val nMax = rs.map(_._4).max
        rs.filter(_._4 == nMax).map(r => (r._1, r._2) -> r._3)
      }.toMap
      val expected = docs.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val capacityOk = expected.keys.groupBy(_._1).forall(_._2.size <= 64)
      assert(capacityOk, "fixture vocabulary must fit the sketch for exact parity")
      assert(got === expected, "sub-capacity sketch must equal exact counts")
    }
  }

  test("heavy-hitter sketch under forced eviction keeps the Misra-Gries guarantees") {
    // k = 2, a true heavy hitter ('a' x 12) against 8 distinct fillers:
    // est >= true - floor(n/k) and the majority item must survive. Fed
    // one token per batch so the eviction sequence is deterministic.
    withRocksDB {
      val stream0 = Seq("a", "b", "a", "c", "a", "d", "a", "e", "a", "f",
        "a", "g", "a", "h", "a", "i", "a", "a", "a", "a")
      val input = MemoryStream[(String, String)](spark)
      val stream = graft.streaming.HeavyHitterProcessor.hitterStream(
        input.toDF().toDF("source", "text"), 2)
      val q = stream.writeStream.format("memory").queryName("hh_evict")
        .outputMode("append").start()
      stream0.foreach { t => input.addData(("s", t)); q.processAllAvailable() }
      q.stop()
      val all = spark.table("hh_evict").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val nMax = all.map(_._3).max
      assert(nMax === stream0.length.toLong)
      val fin = all.filter(_._3 == nMax).map(r => r._1 -> r._2).toMap
      assert(fin.size <= 2, "sketch must never exceed capacity")
      val trueA = stream0.count(_ == "a").toLong
      assert(fin.contains("a"), "majority item must survive eviction")
      assert(fin("a") <= trueA, "estimate is a lower bound")
      assert(fin("a") >= trueA - stream0.length / 2, "Misra-Gries error bound")
    }
  }

  test("transformWithState incremental upsert equals batch cdc_merge_upsert; replay is a no-op") {
    // the streaming face of cdc_merge_upsert: the base snapshot arrives
    // as batch 1 (op I, seq 0), the CDC feed as batch 2 (seq 1) — both
    // frames come from the SAME CdcQueries definitions the batch query
    // uses. The latest alive fact per key must equal the batch-merged
    // table in exact cents; replaying batch 1 afterwards (stale seqs)
    // must change nothing.
    withRocksDB {
      def cents(p: java.math.BigDecimal): Long = p.movePointRight(2).longValueExact()
      val base = graft.queries.CdcQueries.upsertBase(spark, sf).collect()
        .map(r => (r.getLong(0), 0L, "I", cents(r.getDecimal(1))))
      val changes = graft.queries.CdcQueries.upsertChanges(spark, sf).collect()
        .map(r => (r.getLong(0), 1L, r.getString(1),
          Option(r.getDecimal(2)).map(cents).getOrElse(0L)))
      assert(changes.exists(_._3 == "D") && changes.exists(_._3 == "U") &&
        changes.exists(_._3 == "I"), "fixture feed must contain all three ops")
      val input = MemoryStream[(Long, Long, String, Long)](spark)
      val stream = graft.streaming.UpsertProcessor.upsertStream(
        input.toDF().toDF("key", "seq", "op", "cents"))
      val q = stream.writeStream.format("memory").queryName("upsert_incr")
        .outputMode("append").start()
      def state(): Map[Long, (Long, Boolean)] = spark.table("upsert_incr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .groupBy(_._1).map { case (k, es) =>
          val last = es.maxBy(_._2); k -> (last._3, last._4) }
      input.addData(base: _*); q.processAllAvailable()
      input.addData(changes: _*); q.processAllAvailable()
      val merged = state()
      // REPLAY the full base batch: every seq is stale -> state unchanged
      input.addData(base: _*); q.processAllAvailable()
      q.stop()
      assert(state() === merged, "replaying stale changes must be a no-op")
      val alive = merged.collect { case (k, (c, true)) => k -> c }
      val expected = SparkEntry.queries("cdc_merge_upsert")(spark, sf).collect()
        .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 100.0).toLong).toMap
      assert(alive === expected,
        "streamed latest-alive state must equal the batch-merged table")
    }
  }

  test("transformWithState incremental freshness equals batch dq_freshness under REVERSED batching") {
    // the streaming face of dq_freshness (round-6 candidate list). The
    // per-source fold is commutative (max/count only), so arrival order
    // must NOT matter: feed the batches reversed (latest slice first)
    // and still demand exact batch parity. hours_behind needs the GLOBAL
    // max across sources, which a keyed processor cannot see — derive it
    // here from the emitted per-source facts, exactly as a monitor
    // consumer would.
    withRocksDB {
      val rows = Tables.events(spark, sf)
        .select("event_type", "ts").collect()
        .map(r => (r.getString(0), r.getTimestamp(1)))
        .sortBy(t => Streams.toUs(t._2))
      val batches = rows.grouped((rows.length + 3) / 4).toSeq.reverse
      val input = MemoryStream[(String, Timestamp)](spark)
      val stream = graft.streaming.FreshnessProcessor.freshnessStream(
        input.toDF().toDF("event_type", "ts"))
      val q = stream.writeStream.format("memory").queryName("fresh_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // max-n row per source is the current watermark fact
      val facts = spark.table("fresh_incr").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).values.map(_.maxBy(_._3)).toSeq
      val gmaxUs = facts.map(_._2).max
      val got = facts
        .map(f => (f._1, Streams.fromUs(f._2),
          ((gmaxUs - f._2) / 3600000000L).toInt, f._3))
        .toSet
      val expected = SparkEntry.queries("dq_freshness")(spark, sf).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2), r.getLong(3)))
        .toSet
      assert(expected.nonEmpty, "fixture must contain events")
      assert(got === expected,
        "streamed freshness facts must reproduce the batch dq_freshness rows")
    }
  }

  test("transformWithState incremental drift histogram equals batch dq_drift_psi under REVERSED batching") {
    // the streaming face of the drift family: per-bucket cohort counts
    // folded commutatively (two additions), so arrival order must NOT
    // matter — reversed uneven batches, exact count parity against the
    // batch dq_drift_psi rows. The psi itself is consumer-derived from
    // the emitted histogram facts (the FreshnessProcessor hours_behind
    // principle: a keyed processor cannot see other buckets or the
    // cohort totals). The input is the SAME CdcQueries.cohortBuckets
    // frame every batch drift gauge counts.
    withRocksDB {
      val rows = queries.CdcQueries.cohortBuckets(spark, sf, 10)
        .collect().map(r => (r.getInt(1), r.getInt(0)))   // (bucket, cohort)
      val batches = rows.grouped((rows.length + 3) / 4).toSeq.reverse
      val input = MemoryStream[(Int, Int)](spark)
      val stream = graft.streaming.DriftProcessor.driftStream(
        input.toDF().toDF("bucket", "cohort"))
      val q = stream.writeStream.format("memory").queryName("drift_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // max-n row per bucket is the current histogram cell; zero-fill
      // buckets the stream never saw (the batch grid is zero-filled)
      val facts = spark.table("drift_incr").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).values.map(_.maxBy(_._4))
        .map(f => f._1 -> (f._2, f._3)).toMap
      val hist = (0 until 10).map(b => facts.getOrElse(b, (0L, 0L)))
      val expected = SparkEntry.queries("dq_drift_psi")(spark, sf).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
        .sortBy(_._1)
      assert(expected.length === 10)
      expected.foreach { case (b, bc, cc, _) =>
        assert(hist(b) === ((bc, cc)), s"bucket $b counts must match batch")
      }
      // consumer-side gauge: same +1/+10 smoothing, bucket-order fold
      val nb = hist.map(_._1).sum
      val nc = hist.map(_._2).sum
      val psi = (0 until 10).map { b =>
        val pb = (hist(b)._1 + 1).toDouble / (nb + 10).toDouble
        val pc = (hist(b)._2 + 1).toDouble / (nc + 10).toDouble
        (pb - pc) * math.log(pb / pc)
      }.sum
      assert(math.abs(psi - expected.head._4) < 1.1e-6,
        "consumer-derived psi must match the batch emission")
    }
  }

  test("transformWithState Holt: exact batch-query parity on uneven ascending batches") {
    // the processor advances the IDENTICAL integer recurrence the batch
    // ts_holt_forecast folds driver-side — every (day, level, trend,
    // fitted) emission must match the batch fit rows EXACTLY (integer
    // arithmetic leaves no tolerance). Arrival contract: day-ascending
    // across batches (land-time incremental); uneven slices exercise
    // cross-batch state chaining.
    withRocksDB {
      val daily = Tables.events(spark, sf)
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").count().orderBy("day").collect()
        .map(r => (0L, r.getLong(0), r.getLong(1)))
      val batches = Seq(daily.take(1), daily.slice(1, 12), daily.slice(12, 13),
        daily.drop(13)).filter(_.nonEmpty)
      val input = MemoryStream[(Long, Long, Long)](spark)
      val stream = graft.streaming.HoltProcessor.holtStream(
        input.toDF().toDF("series", "day", "cnt"))
      val q = stream.writeStream.format("memory").queryName("holt_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table("holt_incr")
        .select("day", "cnt", "level_u", "trend_u", "fitted_u").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      val expected = SparkEntry.queries("ts_holt_forecast")(spark, sf)
        .where(col("row_type") === "fit")
        .select("day", "cnt", "level_u", "trend_u", "fitted_u").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      assert(expected.nonEmpty)
      assert(got.toSeq === expected.toSeq,
        "streamed Holt fits must equal the batch recurrence exactly")
    }
  }

  test("streaming top-k per nation equals win_topk_per_group under any order and replay") {
    // top-k under the total order (c_acctbal DESC, c_custkey ASC) is a
    // commutative, idempotent max-k fold — reversed uneven batches plus
    // a replay of the last batch must resolve to the batch window
    // query's rows exactly (same JVM: the double order key compares
    // identically on both paths).
    withRocksDB {
      val custs = Tables.customer(spark, sf)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .sortBy(_._2)
      val batches0 = custs.grouped((custs.length + 3) / 4).toSeq.reverse
      val batches = batches0 :+ batches0.last
      val input = MemoryStream[(Int, Long, String, Double)](spark)
      val stream = graft.streaming.TopKProcessor.topkStream(
        input.toDF().toDF("c_nationkey", "c_custkey", "c_name", "c_acctbal"), 3)
      val q = stream.writeStream.format("memory").queryName("topk_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val all = spark.table("topk_incr").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3),
          r.getDouble(4), r.getLong(5)))
      val got = all.groupBy(_._1).view.mapValues { rs =>
        val nMax = rs.map(_._6).max
        rs.filter(_._6 == nMax).sortBy(_._2).map(t => (t._2, t._3, t._4, t._5)).toSeq
      }.toMap
      val expected = SparkEntry.queries("win_topk_per_group")(spark, sf).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3), r.getDouble(4)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)
          .map(t => (t._2, t._3, t._4, t._5)).toSeq).toMap
      assert(got === expected,
        "stream top-k snapshot must equal the batch window query row-for-row")
      // n_seen audits the replay while the kept sets still matched
      val fedPerNation = (custs ++ batches0.last).groupBy(_._1)
        .view.mapValues(_.length.toLong).toMap
      all.groupBy(_._1).foreach { case (nk, rs) =>
        assert(rs.map(_._6).max === fedPerNation(nk), s"n_seen for nation $nk")
      }
    }
  }

  test("streaming hash reservoir equals the batch bottom-k under any order and replay") {
    // min-k by (shared salted hash, doc_id) is commutative AND
    // idempotent — reversed uneven batches plus a full replay of the
    // first batch must land the identical per-source sample.
    withRocksDB {
      val k = 5
      val docs = Tables.documents(spark, sf).select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      val batches0 = docs.grouped((docs.length + 2) / 3).toSeq.reverse
      val batches = batches0 :+ batches0.last // replay: zero effect on the sample
      val input = MemoryStream[(String, Long)](spark)
      val stream = graft.streaming.ReservoirProcessor.reservoirStream(
        input.toDF().toDF("source", "doc_id"), k)
      val q = stream.writeStream.format("memory").queryName("res_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val all = spark.table("res_incr").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val got = all.groupBy(_._1).view.mapValues { rs =>
        val nMax = rs.map(_._4).max
        rs.filter(_._4 == nMax).map(r => (r._3, r._2)).sorted.toSeq
      }.toMap
      // batch recompute through the SAME shared reservoirKey expression
      val expected = Tables.documents(spark, sf)
        .select(col("source"), col("doc_id"),
          graft.queries.SampleQueries.reservoirKey(col("doc_id")).as("h"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(
          _.map(r => (r._3, r._2)).sorted.take(k).toSeq).toMap
      assert(got === expected,
        "stream sample must equal the batch bottom-k doc-for-doc")
      // n_seen audited the replay (it counts re-delivered rows) while
      // the kept sets above still matched — the idempotence claim
      val fedPerSource = (docs ++ batches0.last).groupBy(_._1)
        .view.mapValues(_.length.toLong).toMap
      all.groupBy(_._1).foreach { case (s, rs) =>
        assert(rs.map(_._4).max === fedPerSource(s),
          s"n_seen must count every delivered row for $s")
      }
    }
  }

  test("transformWithState moment monitor equals batch dq_anomaly_zscore under REVERSED batching") {
    // the streaming face of the anomaly gauges: per-series integer
    // moments (n, sum, sum of squares) folded commutatively, so arrival
    // order must NOT matter — reversed uneven batches, exact moment
    // parity, and the consumer-derived z (the batch query's exact IEEE
    // op order over the same integers) must match the batch emission.
    withRocksDB {
      val hc = Tables.events(spark, sf)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt")).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      val rows = hc.map(t => (t._1, t._3))
      val batches = rows.grouped((rows.length + 3) / 4).toSeq.reverse
      val input = MemoryStream[(String, Long)](spark)
      val stream = graft.streaming.MomentsProcessor.momentsStream(
        input.toDF().toDF("series", "x"))
      val q = stream.writeStream.format("memory").queryName("mom_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // max-n row per series is the current moment state
      val facts = spark.table("mom_incr").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).values.map(_.maxBy(_._2))
        .map(f => f._1 -> (f._2, f._3, f._4)).toMap
      val exp = hc.groupBy(_._1).map { case (t, rs) =>
        t -> (rs.size.toLong, rs.map(_._3).sum, rs.map(x => x._3 * x._3).sum) }
      assert(facts === exp, "streamed moments must equal the batch moments exactly")
      // consumer-side gauge: the batch query's op order over the facts
      val expected = SparkEntry.queries("dq_anomaly_zscore")(spark, sf).collect()
        .map(r => ((r.getString(0), r.getTimestamp(1)),
          (r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
      assert(expected.nonEmpty)
      hc.foreach { case (t, h, cnt) =>
        val (n, s, ss) = facts(t)
        val mean = s.toDouble / n
        val variance = (ss.toDouble - s.toDouble * s / n) / (n - 1)
        val z = if (n == 1 || variance <= 0.0) 0.0 else (cnt - mean) / math.sqrt(variance)
        val (bCnt, bZ, bAnom) = expected((t, h))
        assert(bCnt === cnt)
        assert(math.abs(z - bZ) < 1.1e-6, s"z for ($t, $h)")
        assert(bAnom === (math.abs(z) > 3.0), s"flag for ($t, $h)")
      }
    }
  }

  test("transformWithState incremental CMS equals the batch sketch under REVERSED batching") {
    // the streaming face of text_cms_sketch: one counter per grid cell,
    // pure addition — commutative AND associative, so reversed uneven
    // batches must land the IDENTICAL grid. Cells are stamped with the
    // SHARED TextQueries.cmsBucket definition upstream (the
    // ReservoirProcessor contract); per-token estimates are derived
    // consumer-side (min over the token's cells — the cross-cell read a
    // keyed processor must not do) and matched against the batch query.
    withRocksDB {
      import queries.TextQueries.{cmsBucket, cmsDepth}
      def cellsOf(t: org.apache.spark.sql.Column) =
        array((0 until cmsDepth).map(r =>
          (lit(r) * 64 + cmsBucket(t, r)).cast("int")): _*)
      val cellRows = Tables.documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("tok"))
        .select(explode(cellsOf(col("tok"))).as("cell"))
        .collect().map(_.getInt(0))
      val batches = cellRows.grouped((cellRows.length + 3) / 4).toSeq.reverse
      val input = MemoryStream[Int](spark)
      val stream = graft.streaming.CmsProcessor.cmsStream(input.toDF().toDF("cell"))
      val q = stream.writeStream.format("memory").queryName("cms_incr")
        .outputMode("append").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // max-cnt row per cell is the current counter
      val grid = spark.table("cms_incr").collect()
        .map(r => (r.getInt(0), r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      // grid totality: every depth row counts every token occurrence
      (0 until cmsDepth).foreach { r =>
        val rowSum = grid.collect { case (c, n) if c / 64 == r => n }.sum
        assert(rowSum === cellRows.length.toLong / cmsDepth, s"row $r total")
      }
      // consumer-side estimates equal the batch emission exactly
      val vocabCells = Tables.documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count()
        .select(col("tok"), col("count"), cellsOf(col("tok")).as("cells"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2)))
      val expected = SparkEntry.queries("text_cms_sketch")(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val got = vocabCells.map { case (tok, nTrue, cells) =>
        (tok, nTrue, cells.map(c => grid.getOrElse(c, 0L)).min)
      }.sortBy(_._1)
      assert(got.toSeq === expected.toSeq,
        "streamed grid estimates must reproduce the batch sketch emission")
      // the CMS guarantee on the streamed grid: est >= true, always
      got.foreach { case (tok, nTrue, est) =>
        assert(est >= nTrue, s"$tok estimate must never undercount")
      }
    }
  }
}
