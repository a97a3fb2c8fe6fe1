package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qutil._

/** SURVEY §2.3 — joins (Salesforce object relationships / migration
  * reconciliation, /root/reference/README.md:3).
  *
  * Scale posture: bounded dims (region/nation/customer) are broadcast so the
  * fact-side scan never shuffles for them; the fact⋈fact equi-joins shuffle
  * on their keys and are AQE-managed (skew split, runtime SMJ→BHJ).
  */
object JoinQueries {

  val queries: Map[String, Q] = Map(
    // Shuffled equi-join + aggregate: revenue per customer.
    "join_inner_hash" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sumDec2(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("c_custkey")),

    // 5-way star: fact-fact SMJ on orderkey, then broadcast the dims so the
    // star lookup is shuffle-free (the only viable plan shape at 100 TB).
    "join_broadcast_star" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sumMoneyD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")),

    // Runtime Bloom-filter join (r9c) — the row-level sibling of
    // source_dpp_join's partition-level pruning: a selective predicate
    // on the dim side makes Catalyst's InjectRuntimeFilter build a
    // Bloom filter over the surviving join keys (bloom_filter_agg
    // scalar subquery) and push might_contain(xxhash64(l_orderkey))
    // into the FACT SCAN — at 100 TB the shuffle writes only rows that
    // can possibly match (~urgent-order fraction of the fact table)
    // instead of everything, which is THE lever when neither side
    // broadcasts. Config scoping: the thresholds are deployment knobs
    // (applicationSideScanSizeThreshold defaults to 10 GB — a real
    // fact scan qualifies on its own; the fixture scan must be let in
    // explicitly), so the query runs in a NEWSESSION CLONE (isolated
    // SQLConf over the shared context) — nothing leaks to the rest of
    // the catalog. Broadcast is disabled in the clone so the SMJ path
    // the filter exists for is actually exercised (the bucketed-join
    // precedent). Bloom is semantics-free: the oracle is the plain
    // join; SourcesSpec pins might_contain in the fact scan AND its
    // absence without the selective predicate (the source_dpp_join
    // rule: a planner-feature claim gets its plan-shape test the same
    // day or it rots).
    "join_bloom_filtered" -> ((s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sumMoneyD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("l_returnflag")
    }),

    // AQE runtime skew-join splitting (r14 — the r13 verdict's #4):
    // join_skew_salted demonstrates the MANUAL salt; this declares the
    // AUTOMATIC path — AQE's OptimizeSkewedJoin observing the runtime
    // shuffle stats and splitting the hot reduce partition into
    // advisory-sized sub-partitions (duplicating the matching build
    // rows), with NO code-side salt. The fact side plants the skew: 90%
    // of lineitem rows land on key 0. Config scoping: the skew
    // thresholds are deployment knobs (256 MB / factor 5 by default — a
    // real 100 TB hot partition crosses them on its own; the fixture's
    // must be let in), so the clone shrinks them; broadcast is disabled
    // so the skew-splittable SMJ path actually plans, and partition
    // coalescing is off so the skewed partition stays visible to the
    // optimizer. The pre-join repartition(16) simulates the
    // multi-mapper input a real table has naturally — a skewed reduce
    // partition can only split along MAP-OUTPUT boundaries, and the
    // fixture's single-row-group parquet file feeds one mapper.
    // Skew splitting is semantics-free: the oracle is the plain
    // join+aggregate. ScaleSpec pins `skew=true` in the executed plan
    // AND its absence with default thresholds (the source_dpp_join
    // rule: a planner-feature claim gets its plan-shape test the same
    // day or it rots invisibly — the split is golden-invisible by
    // design).
    "join_skew_aqe" -> ((s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the per-key emission aggregate REUSES the join's hash
      // partitioning on k, so by default OptimizeSkewedJoin declines
      // (splitting would invalidate the reused distribution and add a
      // shuffle — measured: no skew=true without this). Forcing takes
      // the classic trade explicitly: one re-shuffle of the join
      // SURVIVORS against one melted hot reducer — at 100 TB the
      // re-shuffle wins by orders of magnitude.
      s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      skewAqeBody(s, d)
    }),

    // Outer join keeping customers with zero orders (orphan detection).
    "join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),

    // Full outer: two-sided reconciliation in one pass — kept customers
    // (left-orphans when orderless) against per-customer order rollups
    // (right-orphans where the customer fell out of the kept set). The
    // classic migration cross-check: "who is only in the CRM, who is only
    // in the order system, who is in both". Full outer can never
    // broadcast (both sides must surface unmatched rows), so the plan is
    // the shuffle-on-key SMJ — exactly the shape that scales: one
    // exchange per side, no driver involvement. Sums are exact decimals;
    // only the emission casts to double.
    "join_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d).where(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("key"), col("c_name"))
      val o = Tables.orders(s, d).groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("n_orders"), sum(dec2(col("o_totalprice"))).as("spend"))
      c.join(o, Seq("key"), "full_outer")
        .select(col("key"),
          when(col("c_name").isNotNull && col("n_orders").isNotNull, "both")
            .when(col("c_name").isNotNull, "customer_only")
            .otherwise("orders_only").as("side"),
          col("c_name"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          emitD(coalesce(col("spend"), lit(0).cast("decimal(18,2)"))).as("spend"))
        .orderBy("key")
    }),

    // Semi: customers having at least one open ('O') order; no right columns.
    "join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Anti: customers with no orders — the classic migration-reconciliation diff.
    "join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Equi + range (interval) predicate: ships within 30 days of order date.
    // Catalyst plans the equi part as the join key; the range rides along as
    // a post-join filter, so no nested-loop blowup.
    "join_range" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate")),

    // As-of: for each event, the user's most recent strictly-prior signup
    // time. One shuffle on user_id; the window scan is linear per user —
    // the standard distributed ASOF shape (no per-row probe joins).
    // Union-merge as-of join with tolerance (r6e) — the SCALABLE
    // two-stream as-of shape (pandas merge_asof semantics): purchases
    // pick up the most recent view by the same user within 30 minutes.
    // Instead of a band join (join_range's shape — candidate pairs
    // explode with bucket width) the two sides UNION with a side tag
    // and ONE sort per user key resolves every match: last tag-0 row
    // before each tag-1 row under (ts, tag, id) ordering — views at the
    // exact purchase timestamp count (tag orders them first). One
    // shuffle + one sort, zero intermediate pairs — the asof plan that
    // survives 100 TB on both sides. The tolerance check is epoch-µs
    // integer arithmetic (the dq_freshness rule: never pair
    // timestampdiff with date_diff cross-engine), and matched (id, ts)
    // ride ONE struct so they can never come from different views.
    "join_asof_union" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val u = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
        .union(ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      u.withColumn("lastv",
          last(when(col("tag") === 0,
            struct(col("ts").as("vts"), col("event_id").as("vid"))),
            ignoreNulls = true).over(w))
        .where(col("tag") === 1)
        .selectExpr("event_id", "user_id", "ts",
          "CASE WHEN lastv IS NOT NULL AND unix_micros(ts) - unix_micros(lastv.vts) <= 1800000000 " +
            "THEN lastv.vid END AS view_id",
          "CASE WHEN lastv IS NOT NULL AND unix_micros(ts) - unix_micros(lastv.vts) <= 1800000000 " +
            "THEN lastv.vts END AS view_ts")
        .orderBy("event_id")
    }),

    // Forward as-of (r6g) — the time-to-conversion mirror of join_asof:
    // for each event, the user's NEXT purchase strictly after it,
    // matched only within a 24 h tolerance (else null) — "how long from
    // touch to conversion", the attribution join marketing funnels run.
    // Same keyed-window machinery as the backward asof with the frame
    // flipped to (1, unboundedFollowing); the matched (pts, pid) rides
    // ONE struct (the join_asof_union tie rule) and the elapsed time is
    // exact epoch-µs integer arithmetic (the dq_freshness rule).
    "join_asof_forward" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("nxt",
          first(when(col("event_type") === "purchase",
            struct(col("ts").as("pts"), col("event_id").as("pid"))),
            ignoreNulls = true).over(w))
        .selectExpr("event_id", "user_id",
          "CASE WHEN nxt IS NOT NULL AND unix_micros(nxt.pts) - unix_micros(ts) <= 86400000000 " +
            "THEN nxt.pid END AS next_purchase_id",
          "CASE WHEN nxt IS NOT NULL AND unix_micros(nxt.pts) - unix_micros(ts) <= 86400000000 " +
            "THEN (unix_micros(nxt.pts) - unix_micros(ts)) DIV 60000000 END AS mins_to_purchase")
        .orderBy("event_id")
    }),

    // Nearest as-of (r9) — the bidirectional completion of the asof
    // family (backward join_asof/_union, forward join_asof_forward):
    // for each purchase, the user's nearest view in EITHER direction
    // within the 30-min tolerance, ties to the backward match (the
    // attribution default). Same union+tag ordering, ONE window pass
    // per direction (both structs ride the join_asof_union tie rule),
    // gaps in exact epoch-µs integers, and the four emissions pick
    // through ONE shared CASE string (nearestPick — Spark and the
    // oracle cannot disagree on the tie rule). A same-ts view sorts
    // before the purchase (tag 0 < 1) and lands backward with gap 0.
    "join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val u = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
        .union(ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag")))
      val wb = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wf = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val vstruct = when(col("tag") === 0,
        struct(col("ts").as("vts"), col("event_id").as("vid")))
      u.withColumn("prv", last(vstruct, ignoreNulls = true).over(wb))
        .withColumn("nxt", first(vstruct, ignoreNulls = true).over(wf))
        .where(col("tag") === 1)
        .selectExpr("event_id", "user_id", "ts",
          s"CASE WHEN prv IS NOT NULL AND unix_micros(ts) - unix_micros(prv.vts) <= $asofNearTol " +
            "THEN unix_micros(ts) - unix_micros(prv.vts) END AS bgap",
          "prv.vid AS bvid", "prv.vts AS bvts",
          s"CASE WHEN nxt IS NOT NULL AND unix_micros(nxt.vts) - unix_micros(ts) <= $asofNearTol " +
            "THEN unix_micros(nxt.vts) - unix_micros(ts) END AS fgap",
          "nxt.vid AS fvid", "nxt.vts AS fvts")
        .selectExpr("event_id", "user_id", "ts",
          s"${nearestPick("'B'", "'F'")} AS direction",
          s"${nearestPick("bvid", "fvid")} AS view_id",
          s"${nearestPick("bvts", "fvts")} AS view_ts",
          s"${nearestPick("bgap", "fgap")} AS gap_us")
        .orderBy("event_id")
    }),

    "join_asof" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("last_signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
        .select("event_id", "user_id", "last_signup_ts")
        .orderBy("event_id")
    }),

    // Two-sided interval OVERLAP join (r6f) — view-sessions × purchase-
    // sessions of the same user that overlap in time. Spark has no
    // native interval join; the naive plan is a per-user range
    // nested-loop. The SCALABLE shape used here is the standard
    // bucket-join decomposition: each interval explodes into its hour
    // buckets (bounded: sessions are gap-bounded), candidates come from
    // an EQUALITY join on (user, hour) — shuffle-on-key, never
    // nested-loop — and the exact half-open overlap predicate
    // (a.start < b.end AND b.start < a.end) re-checks candidates;
    // DISTINCT collapses multi-bucket duplicates. Sessions are
    // gaps-and-islands (per-user window, 30-min gap — the ts_session
    // semantics); all times are epoch-µs integers (the dq_freshness
    // rule), so the overlap duration is exact integer arithmetic.
    "join_interval_overlap" -> ((s, d) => {
      def sessions(tp: String) = sessionsOf(s, d, tp)
      val v = sessions("view")
        .select(col("user_id"), col("st").as("v_st"), col("en").as("v_en"))
      val p = sessions("purchase")
        .select(col("user_id"), col("st").as("p_st"), col("en").as("p_en"))
      val vb = v.withColumn("hb", explode(expr("sequence(v_st DIV 3600000000, v_en DIV 3600000000)")))
      val pb = p.withColumn("hb", explode(expr("sequence(p_st DIV 3600000000, p_en DIV 3600000000)")))
      vb.join(pb, Seq("user_id", "hb"))
        .where(col("v_st") < col("p_en") && col("p_st") < col("v_en"))
        .select(col("user_id"), col("v_st"), col("v_en"), col("p_st"), col("p_en"))
        .distinct()
        .withColumn("overlap_us",
          least(col("v_en"), col("p_en")) - greatest(col("v_st"), col("p_st")))
        .orderBy("user_id", "v_st", "p_st")
    }),

    // Skew-salted equi-join, declared and oracled: Scale.saltedJoin
    // spreads each join key over 8 sub-keys (salt on the large side,
    // 8-way explode on the small side) so ONE hot key occupies 8 reducers
    // instead of melting one — the manual companion to the AQE runtime
    // skew split (ScaleSpec). Semantics identical to the plain inner
    // join, which is exactly what the oracle asserts; the salt is
    // nondeterministic (row-id hash) but collapses in the aggregation.
    "join_skew_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("key"), col("l_quantity"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("key"), col("o_orderpriority"))
      graft.operators.Scale.saltedJoin(li, ord, "key")
        .groupBy("o_orderpriority")
        .agg(sumDec2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // Cartesian 5×25 (bounded!) — nested-loop path.
    "join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")),

    // LATERAL correlated subquery (SQL entry point): each customer's two
    // latest orders — Catalyst decorrelates the per-row subquery into a
    // ranked window join, not an N-times re-execution.
    "join_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      Tables.orders(s, d).createOrReplaceTempView("orders_lat")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_orderdate
          |FROM customer_lat,
          |LATERAL (SELECT o_orderkey, o_orderdate FROM orders_lat
          |         WHERE o_custkey = c_custkey
          |         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) t
          |WHERE c_custkey <= 100
          |ORDER BY c_custkey, o_orderdate DESC, o_orderkey DESC""".stripMargin)
    })
  )

  /** THE gaps-and-islands session frame (user_id, sid, st, en) for one
    * event type — 30-min gap, epoch-µs integers, en = last_ts + gap.
    * ONE definition shared by join_interval_overlap and ts_concurrency
    * (mirrored by sessionCtes), so the two interval consumers can never
    * disagree on what a session is. */
  private[queries] def sessionsOf(s: SparkSession, d: String,
      tp: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d).where(col("event_type") === tp)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        expr("unix_micros(ts) - unix_micros(prev)") >= 1800000000L, 1L)
        .otherwise(0L))
      .withColumn("sid", sum("ns").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(expr("unix_micros(min(ts))").as("st"),
        expr("unix_micros(max(ts)) + 1800000000").as("en"))
  }

  /** Gaps-and-islands session CTEs for one event type (prefix `x`) —
    * epoch-µs integer arithmetic, (ts, event_id) ordering, the exact
    * mirror of sessionsOf. */
  private[queries] def sessionCtes(x: String, tp: String): String =
    s"m$x AS (SELECT user_id, ts, event_id, " +
      "CASE WHEN lag(ts) OVER w IS NULL OR " +
      "epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS ns " +
      s"FROM events WHERE event_type = '$tp' " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
      s"s$x AS (SELECT user_id, ts, SUM(ns) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid " +
      s"FROM m$x), " +
      s"g$x AS (SELECT user_id, sid, epoch_us(MIN(ts)) AS st, " +
      s"epoch_us(MAX(ts)) + 1800000000 AS en FROM s$x GROUP BY 1, 2)"

  /** join_asof_nearest: 30-minute tolerance in exact epoch-µs. */
  private def asofNearTol = 1800000000L

  /** The ONE nearest-match pick rule (join_asof_nearest): backward wins
    * ties; a side only participates when its tolerance-gated gap is
    * non-null. Pure shared-dialect SQL — interpolated verbatim into the
    * Spark selectExpr AND the DuckDB oracle. */
  private def nearestPick(b: String, f: String): String =
    s"CASE WHEN bgap IS NOT NULL AND (fgap IS NULL OR bgap <= fgap) THEN $b " +
      s"WHEN fgap IS NOT NULL THEN $f END"

  /** join_skew_aqe's body, factored so ScaleSpec can run the SAME shape
    * on a default-threshold session as the negative control (no
    * `skew=true` without the shrunken thresholds). Planted skew: 90% of
    * lineitem rows on key 0, the rest spread over l_orderkey % 97; the
    * dim is nation keyed by n_nationkey (keys > 24 drop in the inner
    * join; the hot key survives). The dim must reach the join DIRECTLY
    * from its shuffle: OptimizeSkewedJoin pattern-matches
    * Sort(ShuffleStage) on BOTH children, and any operator in between —
    * a derived dim's distinct aggregate was the first attempt — makes
    * the whole join ineligible (measured r14). Exact-cents money (the
    * DERIVED-money rule); DECIMAL(38,0) sum cast back to BIGINT (the
    * agg_mode rule). */
  private[graft] def skewAqeBody(s: SparkSession, d: String): DataFrame = {
    val f = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 10 =!= 0, lit(0L))
        .otherwise(col("l_orderkey") % 97).as("k"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .repartition(16)
    val dim = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
    f.join(dim, Seq("k"))
      .groupBy("k", "n_name")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(cents AS DECIMAL(38,0))")).cast("long").as("sum_cents"))
      .orderBy("k")
  }

  val oracle: Map[String, String] = Map(
    "join_asof_nearest" ->
      // same union/tag/window machinery as the asof_union oracle, both
      // directions, the shared nearestPick CASE for all four emissions
      ("WITH u AS (SELECT user_id, ts, event_id, 0 AS tag FROM events WHERE event_type = 'view' " +
       "UNION ALL SELECT user_id, ts, event_id, 1 AS tag FROM events WHERE event_type = 'purchase'), " +
       "w AS (SELECT *, last_value(CASE WHEN tag = 0 THEN struct_pack(vts := ts, vid := event_id) END " +
       "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prv, " +
       "first_value(CASE WHEN tag = 0 THEN struct_pack(vts := ts, vid := event_id) END " +
       "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id " +
       "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt FROM u), " +
       "g AS (SELECT event_id, user_id, ts, " +
       s"CASE WHEN prv IS NOT NULL AND epoch_us(ts) - epoch_us((prv).vts) <= $asofNearTol " +
       "THEN epoch_us(ts) - epoch_us((prv).vts) END AS bgap, " +
       "(prv).vid AS bvid, (prv).vts AS bvts, " +
       s"CASE WHEN nxt IS NOT NULL AND epoch_us((nxt).vts) - epoch_us(ts) <= $asofNearTol " +
       "THEN epoch_us((nxt).vts) - epoch_us(ts) END AS fgap, " +
       "(nxt).vid AS fvid, (nxt).vts AS fvts FROM w WHERE tag = 1) " +
       "SELECT event_id, user_id, ts, " +
       s"${nearestPick("'B'", "'F'")} AS direction, " +
       s"${nearestPick("bvid", "fvid")} AS view_id, " +
       s"${nearestPick("bvts", "fvts")} AS view_ts, " +
       s"${nearestPick("bgap", "fgap")} AS gap_us " +
       "FROM g ORDER BY event_id"),
    "join_interval_overlap" ->
      // the oracle side joins intervals DIRECTLY on the half-open overlap
      // predicate (no bucketing needed off-engine) — proving the bucketed
      // equality-join decomposition emits exactly the overlap pairs
      (s"WITH ${sessionCtes("v", "view")}, ${sessionCtes("p", "purchase")} " +
       "SELECT v.user_id, v.st AS v_st, v.en AS v_en, p.st AS p_st, p.en AS p_en, " +
       "LEAST(v.en, p.en) - GREATEST(v.st, p.st) AS overlap_us " +
       "FROM gv v JOIN gp p ON v.user_id = p.user_id " +
       "AND v.st < p.en AND p.st < v.en " +
       "ORDER BY v.user_id, v_st, p_st"),
    "join_inner_hash" ->
      ("SELECT c_custkey, c_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
       "COUNT(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey " +
       "GROUP BY 1,2 ORDER BY 1"),
    "join_broadcast_star" ->
      ("SELECT r_name, n_name, CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS DECIMAL(18,0))*CAST(0.01 AS DECIMAL(3,2))) AS DOUBLE) AS revenue, " +
       "COUNT(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey GROUP BY 1,2 ORDER BY 1,2"),
    "join_bloom_filtered" ->
      // the Bloom filter is semantics-free — the oracle is the plain
      // filtered join with the shared DERIVED-money spelling
      ("SELECT l_returnflag, CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) " +
       "AS DECIMAL(18,0))*CAST(0.01 AS DECIMAL(3,2))) AS DOUBLE) AS revenue, " +
       "COUNT(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "WHERE o_orderpriority = '1-URGENT' GROUP BY 1 ORDER BY 1"),
    "join_skew_aqe" ->
      // AQE skew splitting is semantics-free — the oracle is the plain
      // planted-skew join+aggregate (the join_skew_salted convention)
      ("WITH f AS (SELECT CASE WHEN l_orderkey % 10 <> 0 THEN CAST(0 AS BIGINT) " +
       "ELSE l_orderkey % 97 END AS k, " +
       "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents FROM lineitem) " +
       "SELECT f.k AS k, n_name, COUNT(*) AS n, " +
       "CAST(SUM(cents) AS BIGINT) AS sum_cents " +
       "FROM f JOIN nation ON f.k = CAST(n_nationkey AS BIGINT) " +
       "GROUP BY 1, 2 ORDER BY 1"),
    "join_left_outer" ->
      ("SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders FROM customer " +
       "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1,2 ORDER BY 1"),
    "join_full_outer" ->
      ("WITH c AS (SELECT c_custkey AS key, c_name FROM customer WHERE c_custkey % 3 <> 0), " +
       "o AS (SELECT o_custkey AS key, COUNT(*) AS n_orders, " +
       "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend FROM orders GROUP BY 1) " +
       "SELECT COALESCE(c.key, o.key) AS key, " +
       "CASE WHEN c_name IS NOT NULL AND n_orders IS NOT NULL THEN 'both' " +
       "WHEN c_name IS NOT NULL THEN 'customer_only' ELSE 'orders_only' END AS side, " +
       "c_name, COALESCE(n_orders, 0) AS n_orders, " +
       "CAST(COALESCE(spend, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS spend " +
       "FROM c FULL OUTER JOIN o ON c.key = o.key ORDER BY key"),
    "join_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
       "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O') " +
       "ORDER BY c_custkey"),
    "join_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
       "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
    "join_range" ->
      ("SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate FROM lineitem " +
       "JOIN orders ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate " +
       "AND l_shipdate <= o_orderdate + INTERVAL 30 DAY " +
       "ORDER BY l_orderkey, l_linenumber, l_shipdate"),
    "join_asof_union" ->
      // same union + tag ordering + one struct-valued last_value window;
      // identical epoch-µs integer tolerance on both projected fields
      ("WITH u AS (SELECT user_id, ts, event_id, 0 AS tag FROM events WHERE event_type = 'view' " +
       "UNION ALL SELECT user_id, ts, event_id, 1 AS tag FROM events WHERE event_type = 'purchase'), " +
       "w AS (SELECT *, last_value(CASE WHEN tag = 0 THEN struct_pack(vts := ts, vid := event_id) END " +
       "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastv FROM u) " +
       "SELECT event_id, user_id, ts, " +
       "CASE WHEN lastv IS NOT NULL AND epoch_us(ts) - epoch_us((lastv).vts) <= 1800000000 " +
       "THEN (lastv).vid END AS view_id, " +
       "CASE WHEN lastv IS NOT NULL AND epoch_us(ts) - epoch_us((lastv).vts) <= 1800000000 " +
       "THEN (lastv).vts END AS view_ts " +
       "FROM w WHERE tag = 1 ORDER BY event_id"),
    "join_asof_forward" ->
      // the same flipped frame; the matched pair rides one struct; µs
      // integer elapsed (// == DIV on the nonnegative forward gap)
      ("WITH w AS (SELECT event_id, user_id, ts, " +
       "first_value(CASE WHEN event_type = 'purchase' " +
       "THEN struct_pack(pts := ts, pid := event_id) END IGNORE NULLS) " +
       "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt FROM events) " +
       "SELECT event_id, user_id, " +
       "CASE WHEN nxt IS NOT NULL AND epoch_us((nxt).pts) - epoch_us(ts) <= 86400000000 " +
       "THEN (nxt).pid END AS next_purchase_id, " +
       "CASE WHEN nxt IS NOT NULL AND epoch_us((nxt).pts) - epoch_us(ts) <= 86400000000 " +
       "THEN (epoch_us((nxt).pts) - epoch_us(ts)) // 60000000 END AS mins_to_purchase " +
       "FROM w ORDER BY event_id"),
    "join_asof" ->
      ("SELECT event_id, user_id, last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS) " +
       "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
       "AS last_signup_ts FROM events ORDER BY event_id"),
    "join_skew_salted" ->
      ("SELECT o_orderpriority, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
       "COUNT(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY 1 ORDER BY 1"),
    "join_cross" ->
      ("SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation " +
       "ORDER BY r_regionkey, n_nationkey"),
    "join_lateral" ->
      ("SELECT c_custkey, o_orderkey, o_orderdate FROM customer, " +
       "LATERAL (SELECT o_orderkey, o_orderdate FROM orders WHERE o_custkey = c_custkey " +
       "ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) t " +
       "WHERE c_custkey <= 100 ORDER BY c_custkey, o_orderdate DESC, o_orderkey DESC")
  )
}
