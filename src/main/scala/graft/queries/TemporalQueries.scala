package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qutil._

/** SURVEY §2.9 — temporal / sessionization over `events` (the batch face of
  * the Airflow micro-batch cadence, /root/reference/README.md:9). The same
  * window/session_window/dropDuplicates dialect runs unchanged on a
  * Structured Streaming source (see graft.streaming + StreamingSpec). */
object TemporalQueries {

  /** Zero-filled dense (event_type × hour) grid — the ts_gap_fill body,
    * shared with ts_ema_smooth so the two queries can never disagree on
    * what the gap-filled series is. Bounded output: |types| × span-hours
    * rows at any data size; the event scan ends at the count aggregate. */
  private def hourlyGrid(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val cnts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
    // bounds and the type list re-derive from the AGGREGATED counts
    // (identical values — every observed type/hour survives the groupBy),
    // so the raw events table is scanned exactly once
    val bounds = cnts.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val grid = cnts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), col("mn"),
        explode(expr("sequence(0, CAST(timestampdiff(HOUR, mn, mx) AS INT))")).as("i"))
      .select(col("event_type"), expr("timestampadd(HOUR, i, mn)").as("h"))
    grid.join(cnts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Shared emission formulas (defs: oracle Map init-order rule).
    * wapeF: one division of two exact integer sums (ts_forecast_eval);
    * popPctF: relative change (a−b)/b over exact-decimal-derived doubles
    * in one fixed op order (ts_period_over_period). */
  private def wapeF: String =
    "((CASE WHEN isnan((CAST(sum_abs AS DOUBLE) / CAST(sum_act AS DOUBLE))) OR abs((CAST(sum_abs AS DOUBLE) / CAST(sum_act AS DOUBLE))) >= 9e12 THEN CAST((CAST(sum_abs AS DOUBLE) / CAST(sum_act AS DOUBLE)) AS DOUBLE) ELSE CAST(floor((CAST(sum_abs AS DOUBLE) / CAST(sum_act AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END))"
  private def popPctF(a: String, b: String): String =
    s"((CASE WHEN isnan(((CAST($a AS DOUBLE) - CAST($b AS DOUBLE)) / CAST($b AS DOUBLE))) OR abs(((CAST($a AS DOUBLE) - CAST($b AS DOUBLE)) / CAST($b AS DOUBLE))) >= 9e12 THEN CAST(((CAST($a AS DOUBLE) - CAST($b AS DOUBLE)) / CAST($b AS DOUBLE)) AS DOUBLE) ELSE CAST(floor(((CAST($a AS DOUBLE) - CAST($b AS DOUBLE)) / CAST($b AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END))"

  val queries: Map[String, Q] = Map(
    // Holt linear-trend smoothing + 3-step forecast (r6f) — the
    // FORECASTING member of the ts family (ema smooths, decompose
    // explains, seasonal_baseline flags; this extrapolates). The daily
    // total series is a BOUNDED grid (one row per day — 30 on the
    // fixtures, still tiny at 100 TB: the scan aggregates map-side and
    // only the grid crosses to the driver, the kmeans/pca collect
    // class). State is EXACT INTEGER micro-units with power-of-two
    // smoothing rationals (alpha = 1/2, beta = 1/4):
    //   l_t = (y_t*1e6 + l + b) idiv 2
    //   b_t = (l_t - l) idiv 4 + (3*b) idiv 4
    // where idiv TRUNCATES TOWARD ZERO on both engines (measured r6f:
    // DuckDB integer // truncates like Scala Long / and Spark DIV —
    // it is NOT floor division on negatives; trend terms go negative,
    // so this distinction is live). The fold runs driver-side in
    // Scala over the bounded grid, mirrored by the oracle's recursive
    // CTE replaying the identical recurrence.
    // One-step-ahead fit ŷ_t = l_{t-1} + b_{t-1}; h-step forecast
    // l_T + h*b_T. Output is integer-only — NO floating point exists
    // anywhere in this query.
    "ts_holt_forecast" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").agg(count(lit(1)).as("cnt"))
        .orderBy("day").collect()                 // bounded: one row per day
      val days = grid.map(_.getLong(0)).toSeq
      val ys = grid.map(_.getLong(1)).toSeq
      val states = ys.tail.scanLeft((ys.head * 1000000L, 0L)) {
        case ((l, b), y) =>
          val lN = (y * 1000000L + l + b) / 2L
          val bN = (lN - l) / 4L + (3L * b) / 4L
          (lN, bN)
      }
      val fit = days.indices.map { t =>
        val (l, b) = states(t)
        val f = if (t == 0) ys.head * 1000000L
                else states(t - 1)._1 + states(t - 1)._2
        (days(t), "fit", Option(ys(t)), l, b, f)
      }
      val (lT, bT) = states.last
      val fc = (1L to 3L).map(h =>
        (days.last + h, "forecast", None: Option[Long], lT, bT, lT + h * bT))
      import s.implicits._
      (fit ++ fc).toDF("day", "row_type", "cnt", "level_u", "trend_u", "fitted_u")
        .orderBy("day")
    }),

    // Rolling-origin forecast backtest (r6g) — the eval the Holt fit
    // needs before anyone trusts it: hold out the LAST 3 days, run the
    // IDENTICAL integer micro-unit recurrence on the prefix (the
    // ts_holt_forecast / HoltProcessor recurrence — change all three
    // together), forecast h = 1..3, and score against the held-out
    // actuals. Errors are EXACT integers (micro-unit subtraction); the
    // only FP is the one shared WAPE division (round 6). Same bounded
    // day-grid collect class as the fit query; the oracle replays the
    // train-prefix recurrence as a recursive CTE and re-derives the
    // same errors.
    "ts_forecast_eval" -> ((s, d) => {
      val grid = Tables.events(s, d)
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").agg(count(lit(1)).as("cnt"))
        .orderBy("day").collect()                 // bounded: one row per day
      val days = grid.map(_.getLong(0)).toSeq
      val ys = grid.map(_.getLong(1)).toSeq
      require(days.length >= 4,
        s"ts_forecast_eval needs >= 4 distinct event days (1 train + 3 " +
          s"holdout); fixture at $d has ${days.length}")
      val ntrain = ys.length - 3
      val trainY = ys.take(ntrain)
      val states = trainY.tail.scanLeft((trainY.head * 1000000L, 0L)) {
        case ((l, b), y) =>
          val lN = (y * 1000000L + l + b) / 2L
          val bN = (lN - l) / 4L + (3L * b) / 4L
          (lN, bN)
      }
      val (lT, bT) = states.last
      val rows = (1L to 3L).map { h =>
        val actual = ys(ntrain - 1 + h.toInt)
        val f = lT + h * bT
        (h, days(ntrain - 1 + h.toInt), actual, f, math.abs(f - actual * 1000000L))
      }
      val sumAbs = rows.map(_._5).sum
      val sumAct = rows.map(_._3).sum * 1000000L
      import s.implicits._
      rows.toDF("h", "day", "actual", "forecast_u", "abs_err_u")
        .withColumn("sum_abs", lit(sumAbs)).withColumn("sum_act", lit(sumAct))
        .selectExpr("h", "day", "actual", "forecast_u", "abs_err_u",
          s"$wapeF AS wape")
        .orderBy("h")
    }),

    // Concurrent-session occupancy (r6g) — "how many sessions are alive
    // each hour": the capacity-planning gauge (ts_session censuses
    // sessions; this measures their OVERLAP, which is what sizes a
    // serving fleet). Sessions come from THE shared gaps-and-islands
    // frame (JoinQueries.sessionsOf — one definition with
    // join_interval_overlap, mirrored by sessionCtes), each session
    // explodes into its covered epoch-hours (bounded: sessions are
    // gap-bounded), and occupancy is one partial-aggregable groupBy per
    // hour. All epoch-µs/hour integers; Spark sequence is inclusive,
    // DuckDB range exclusive (+1 — the r3 rule).
    "ts_concurrency" -> ((s, d) =>
      JoinQueries.sessionsOf(s, d, "view")
        .selectExpr("user_id",
          "explode(sequence(st DIV 3600000000, en DIV 3600000000)) AS hr")
        .groupBy("hr")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("hr")),

    // Day-of-week × hour activity heatmap (r6g) — the weekly-rhythm
    // profile next to ts_seasonal_baseline's hour-of-day baseline (a
    // weekday-9am spike and a sunday-9am spike are different stories):
    // ONE partial-aggregable groupBy over (dow, hour), densified onto
    // the bounded 7×24 grid (zero cells matter in a heatmap — the
    // ts_active_users lesson). Cross-engine day-of-week: Spark
    // dayofweek − 1 == DuckDB dayofweek (the fn_date rule); cents are
    // exact; no FP anywhere.
    "ts_dow_hour_heatmap" -> ((s, d) => {
      val ev = Tables.events(s, d).selectExpr(
        "CAST(dayofweek(ts) - 1 AS INT) AS dow", "CAST(hour(ts) AS INT) AS hr",
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents")
      val cnts = ev.groupBy("dow", "hr").agg(count(lit(1)).as("n"),
        sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sc"))
      val grid = s.range(0, 7).select(col("id").cast("int").as("dow"))
        .crossJoin(broadcast(s.range(0, 24).select(col("id").cast("int").as("hr"))))
      grid.join(cnts, Seq("dow", "hr"), "left")
        .selectExpr("dow", "hr", "COALESCE(n, CAST(0 AS BIGINT)) AS n",
          "COALESCE(CAST(sc AS BIGINT), CAST(0 AS BIGINT)) AS cents")
        .orderBy("dow", "hr")
    }),

    // Period-over-period revenue report (r6g) — the MoM/YoY deltas every
    // finance dashboard opens with: monthly exact-cents revenue off the
    // integer month index year*12+month-1, prior periods via TWO
    // broadcast equality self-joins of the bounded checkpointed month
    // frame (midx = midx+1 / midx+12 — never a partitionless lag
    // window; the frame is ~tens of rows, checkpointed once for its
    // three consumers per the bounded multi-consumer rule). Deltas stay
    // exact BIGINT cents; the two pct emissions are one shared-formula
    // division each (round 6), NULL where no prior period exists (left
    // join null propagates identically on both engines).
    "ts_period_over_period" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .selectExpr(
          "CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate) - 1 AS midx",
          "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents")
        .groupBy("midx")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sc"))
        .transform(graft.operators.Scale.materialize)
      m.join(broadcast(m.selectExpr("midx + 1 AS midx", "sc AS prev_sc")),
          Seq("midx"), "left")
        .join(broadcast(m.selectExpr("midx + 12 AS midx", "sc AS yoy_sc")),
          Seq("midx"), "left")
        .selectExpr("midx", "midx DIV 12 AS yr", "midx % 12 + 1 AS mo", "n_orders",
          "CAST(sc AS BIGINT) AS cents",
          "CAST(sc - prev_sc AS BIGINT) AS mom_delta_cents",
          s"${popPctF("sc", "prev_sc")} AS mom_pct",
          s"${popPctF("sc", "yoy_sc")} AS yoy_pct")
        .orderBy("midx")
    }),

    // Cumulative-unique growth curve (r6f): per day, event volume, NEW
    // users (first ever appearance), and the running count of distinct
    // users to date — the growth metric every usage dashboard leads
    // with. Exact cumulative distinct WITHOUT a distinct-over-window:
    // first-seen day per user is ONE groupBy(user) min (distributes;
    // map-side partial), new-user counts land on the bounded day grid,
    // and cumulation is the bounded-grid broadcast self-join (the
    // dq_ks_drift / CUSUM shape — never a partitionless window). The
    // grid is driven from ALL observed days (left join + zero-fill), so
    // days where nobody new arrived still emit their running total (the
    // ts_active_users lesson). Closure: the last cum_users equals the
    // corpus-wide distinct user count (pinned in CatalogSpec).
    "ts_unique_cumulative" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
      val days = ev.groupBy("day").agg(count(lit(1)).as("n_events"))
      val nu = ev.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      // bounded multi-consumer frame (probe + broadcast build): checkpoint
      // once or the event scan runs twice (the chi2-grid rule)
      val nd = days.join(nu, Seq("day"), "left")
        .select(col("day"), col("n_events"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
        .transform(graft.operators.Scale.materialize)
      nd.as("a").join(broadcast(nd.as("g")), col("g.day") <= col("a.day"))
        .groupBy(col("a.day").as("day"))
        .agg(max(col("a.n_events")).as("n_events"),
          max(col("a.new_users")).as("new_users"),
          sum(col("g.new_users")).as("cum_users"))
        .orderBy("day")
    }),

    // Rolling 24-hour Pearson correlation (r6f) between the view and
    // purchase hourly series — the cross-series gauge next to
    // agg_corr's global one ("are these signals coupled, and when did
    // the coupling break?"). Built entirely on the BOUNDED zero-filled
    // grid: hourlyGrid (shared with ts_gap_fill/ema — one grid
    // definition), two conditional sums pivot the pair per hour, and
    // the trailing window is the bounded-grid broadcast self-join (the
    // CUSUM/ks shape, WITH the explicit broadcast hint — non-equi joins
    // of checkpointed frames degrade to CartesianProduct without it,
    // the r6f lesson). Window moments are exact integer sums; the only
    // FP is the shared sqrt-based formula (round 6 — sqrt is exempt
    // from the geomean rule). Complete windows only (n = 24).
    "ts_rolling_corr" -> ((s, d) => {
      val g = hourlyGrid(s, d).selectExpr("event_type",
        "unix_micros(h) DIV 3600000000 AS hi", "cnt")
      val xy = g.where(col("event_type").isin("view", "purchase"))
        .groupBy("hi")
        .agg(sum(when(col("event_type") === "view", col("cnt")).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", col("cnt")).otherwise(0L)).as("y"))
        .transform(graft.operators.Scale.materialize)
      xy.as("a").join(broadcast(xy.as("b")),
          col("b.hi") >= col("a.hi") - 23 && col("b.hi") <= col("a.hi"))
        .groupBy(col("a.hi").as("hi"))
        .agg(count(lit(1)).as("n"),
          sum(col("b.x")).as("sx"), sum(col("b.y")).as("sy"),
          sum(expr("b.x * b.x")).as("sxx"), sum(expr("b.y * b.y")).as("syy"),
          sum(expr("b.x * b.y")).as("sxy"))
        .where(col("n") === 24)
        .selectExpr("hi", s"$rollCorrSql AS corr24")
        .orderBy("hi")
    }),

    // Autocorrelation function (r6g) — ACF at lags 1..12 hours of each
    // event type's hourly series, the periodicity detector that tells a
    // pipeline WHICH seasonal window to use (ts_decompose assumes 24h;
    // this measures it). Exact-integer formulation: multiply the
    // mean-centered deviation through by n, so dev_t = n*y_t - S is an
    // exact BIGINT, num_l = sum(dev_t * dev_{t+l}) and
    // den = sum(dev_t^2) are order-free DECIMAL(38,0) sums (the
    // skew_kurt rule), and the ONLY FP is one shared-formula division
    // (round 6; decimal->double is correctly rounded on both engines).
    // The lag pairing is the bounded-grid broadcast self-join (the
    // rolling_corr shape, WITH the explicit broadcast hint — the r6f
    // CartesianProduct lesson); the event scan ends at the hourly count
    // aggregate, so everything past it is grid-cardinality.
    "ts_autocorr" -> ((s, d) => {
      val g = hourlyGrid(s, d).selectExpr("event_type",
        "unix_micros(h) DIV 3600000000 AS hi", "cnt")
        .transform(graft.operators.Scale.materialize)
      val st = g.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"))
      val gd = g.join(broadcast(st), Seq("event_type"))
        .selectExpr("event_type", "hi", "n", "n * cnt - s AS dev")
      val den = gd.groupBy("event_type")
        .agg(max(col("n")).as("n"),
          sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("den"))
      gd.as("a").join(broadcast(gd.as("b")),
          col("b.event_type") === col("a.event_type") &&
            col("b.hi") >= col("a.hi") + 1 && col("b.hi") <= col("a.hi") + 12)
        .groupBy(col("a.event_type").as("event_type"),
          (col("b.hi") - col("a.hi")).as("lag"))
        .agg(sum(expr("CAST(a.dev AS DECIMAL(38,0)) * b.dev")).as("num"))
        .join(broadcast(den), Seq("event_type"))
        .selectExpr("event_type", "lag", "n", s"$acfF AS acf")
        .orderBy("event_type", "lag")
    }),

    // Inter-arrival latency histogram (r6f) — the distribution of gaps
    // between a user's consecutive events on log2 buckets, the
    // heavy-tail diagnostic behind every session-gap / timeout-tuning
    // decision (ts_session's 30-minute gap parameter comes FROM a chart
    // like this). Exact integer bucketing with no log(): the bucket is
    // the BINARY STRING LENGTH of the µs gap (floor(log2)+1) — Spark
    // bin() and DuckDB bin() both render unpadded binary, so the bucket
    // function is identical by construction (verified r6f; gap 0 lands
    // in bucket 1 on both). One user-partitioned lag window (the
    // join_asof shuffle shape) + one bounded-key aggregate.
    "ts_interarrival" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(expr("unix_micros(ts)"), 1).over(w))
        .where(col("prev_us").isNotNull)
        .selectExpr("unix_micros(ts) - prev_us AS gap_us")
        .selectExpr("CAST(length(bin(gap_us)) AS INT) AS bucket", "gap_us")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("gap_us").as("min_gap_us"),
          max("gap_us").as("max_gap_us"))
        .orderBy("bucket")
    }),

    // 1-hour tumbling windows per event type.
    "ts_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("wstart", "event_type")),

    // 1-hour windows sliding every 15 min (each event lands in 4 windows).
    "ts_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("n"))
        .orderBy("wstart")),

    // Session windows per user, 30-minute gap. Spark semantics: a session is
    // [first_ts, last_ts + gap); an event at exactly prev_ts+gap starts a
    // NEW session — the oracle's gaps-and-islands SQL uses `>= gap`.
    "ts_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), sumDec2(col("value")).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start")),

    // Gap filling: the dense (event_type × hour) grid over the corpus span
    // with zero-filled missing buckets — what every downstream
    // rate/anomaly job needs (a missing bucket is NOT the same as an
    // unobserved one). Shape: aggregate counts (distributes), then a
    // bounded generated dimension — |types| × span-hours rows, data-size
    // independent — broadcast-left-joined against the counts. The grid is
    // generated with sequence/explode, never materialized row-per-event.
    "ts_gap_fill" -> ((s, d) =>
      hourlyGrid(s, d).orderBy("event_type", "h")),

    // Truncated exponential moving average (window 20 hours, alpha = 1/2)
    // over the zero-filled hourly counts — the smoothing every
    // rate-monitoring job runs downstream of gap filling. Weights are
    // EXACT negative powers of two from a literal table and every
    // count*2^-k term (and every partial sum — mantissa span <= 19 weight
    // bits + count bits) is exactly representable, so the groupBy sum is
    // order-independent and the ONLY rounding is the final normalize
    // division — bit-deterministic on both engines with no window
    // function at all: each grid hour SCATTERS its count forward to the
    // next 20 hours (bounded 20x explode of the bounded grid), and one
    // shuffle-on-(type,hour) aggregate gathers numerator and normalizer
    // (heads normalize over the lags that exist). All post-scan work is
    // grid-cardinality, data-size independent.
    "ts_ema_smooth" -> ((s, d) => {
      val gf = hourlyGrid(s, d)
      val w20 = typedlit((0 until 20).map(k => 1.0 / (1L << k)))
      val contrib = gf
        .select(col("event_type"), col("h"), col("cnt"),
          explode(sequence(lit(0), lit(19))).as("k"))
        .select(col("event_type"),
          expr("timestampadd(HOUR, k, h)").as("h"),
          (col("cnt").cast("double") * element_at(w20, col("k") + 1)).as("wc"),
          element_at(w20, col("k") + 1).as("w"))
      val ema = contrib.groupBy("event_type", "h")
        .agg(sum(col("wc")).as("num"), sum(col("w")).as("den"))
      // inner join back to the grid drops contributions scattered past the
      // series end and re-attaches the hour's own count
      gf.join(ema, Seq("event_type", "h"))
        .select(col("event_type"), col("h"), col("cnt"),
          r6(col("num") / col("den")).as("ema"))
        .orderBy("event_type", "h")
    }),

    // Linear interpolation over the gap-filled hourly series — gap_fill's
    // sibling for VALUE series (a missing bucket needs an estimate, not a
    // zero). Observed hours carry the deterministic decimal-sum mean;
    // missing interior hours interpolate between the nearest observed
    // neighbors (fraction = integer hour offsets, one fixed IEEE op
    // sequence, round 6); leading/trailing gaps clamp to the nearest
    // observed value. The four neighbor columns come from running
    // last/first IGNORE NULLS windows over the BOUNDED grid (|types| ×
    // span-hours rows, data-size independent — the event scan itself ends
    // at the partial+final mean aggregate).
    "ts_interpolate" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
      val hourly = ev.groupBy("event_type", "h").agg(avgDec2(col("value")).as("v"))
      val bounds = hourly.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      val grid = hourly.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), col("mn"),
          explode(expr("sequence(0, CAST(timestampdiff(HOUR, mn, mx) AS INT))")).as("i"))
        .select(col("event_type"), expr("timestampadd(HOUR, i, mn)").as("h"))
      val wP = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wN = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(hourly, Seq("event_type", "h"), "left")
        .withColumn("__pv", last(col("v"), ignoreNulls = true).over(wP))
        .withColumn("__ph", last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wP))
        .withColumn("__nv", first(col("v"), ignoreNulls = true).over(wN))
        .withColumn("__nh", first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wN))
        .select(col("event_type"), col("h"),
          when(col("v").isNotNull, col("v"))
            .when(col("__pv").isNull, col("__nv"))
            .when(col("__nv").isNull, col("__pv"))
            .otherwise(r6(col("__pv") + (col("__nv") - col("__pv")) *
              (expr("CAST(timestampdiff(HOUR, __ph, h) AS DOUBLE)") /
               expr("CAST(timestampdiff(HOUR, __ph, __nh) AS DOUBLE)")))).as("v"),
          col("v").isNotNull.as("observed"))
        .orderBy("event_type", "h")
    }),

    // Conversion funnel view -> click -> purchase, ordered by each user's
    // FIRST occurrence of each stage: one conditional-aggregation pass
    // builds the per-user stage timestamps (min-when, partial-aggregable),
    // then one bounded scalar aggregate counts stage survivors. Ordering
    // uses strict < on first-occurrence times — no self-join, no window,
    // one scan of the event stream.
    "ts_funnel" -> ((s, d) => {
      val f = Tables.events(s, d).groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      def cnt(pred: org.apache.spark.sql.Column) =
        sum(when(pred, 1L).otherwise(0L))
      f.agg(
        cnt(col("t_view").isNotNull).as("n_view"),
        cnt(col("t_view") < col("t_click")).as("n_view_click"),
        cnt(col("t_view") < col("t_click") && col("t_click") < col("t_buy"))
          .as("n_view_click_buy"))
        .selectExpr("stack(3, 'v_view', n_view, 'w_view_click', n_view_click, " +
          "'x_view_click_buy', n_view_click_buy) AS (stage, n_users)")
        .orderBy("stage")
    }),

    // Cohort retention: users grouped by first-seen day, counted on each
    // later active day as an offset from their cohort day — the matrix
    // behind every retention curve. All stages are key-grouped aggregates
    // (distinct activity on (user, day), cohort min per user, final count
    // per (cohort, offset)) — no window, no self-join; distributes on the
    // user key, then on the bounded (cohort × offset) key.
    "ts_retention_cohort" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val cohort = act.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
      act.join(cohort, "user_id")
        .groupBy(col("cohort_day"), datediff(col("d"), col("cohort_day")).as("day_k"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_k")
    }),

    // OHLC downsampling: per (event_type, hour) emit the opening value
    // (first event by (ts, event_id)), high, low, and closing value (last
    // event) — the candlestick compaction every metrics store runs before
    // charting/retention. Open/close are min/max STRUCT argmax AGGREGATES
    // over the (ts, event_id, value) triple (map-side partials, one
    // shuffle on the group key, never a window over the stream); high/low
    // are plain extrema; values pass through untouched (selection, not
    // arithmetic — no rounding rule needed).
    "ts_ohlc" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
          min(col("value")).as("low"), max(col("value")).as("high"))
        .select(col("event_type"), col("hr"), col("n"),
          col("o.value").as("open"), col("high"), col("low"),
          col("c.value").as("close"))
        .orderBy("event_type", "hr")),

    // DAU + trailing-7-day WAU per day — the engagement counters every
    // product-analytics load computes. Rolling DISTINCT cannot be a
    // window aggregate (distinct doesn't decompose over sliding frames);
    // the scalable shape is the EMA scatter: each (user, active day)
    // fans out to the <=7 anchor days whose trailing window contains it
    // (bounded 7x explode of the distinct activity set), then one
    // count_distinct per anchor day. Anchors are clipped to the observed
    // day span. The WAU side DRIVES the output (r5 ADVICE): a day with
    // zero activity but a nonzero trailing-7-day WAU still emits a row
    // (dau coalesced to 0) — full per-day WAU coverage, not just
    // active days.
    "ts_active_users" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val bounds = act.agg(max(col("day")).as("mx"))
      val dau = act.groupBy("day").agg(count_distinct(col("user_id")).as("dau"))
      val wau = act.crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("k"), col("day"), col("mx"))
        .select(col("user_id"), date_add(col("day"), col("k")).as("day"), col("mx"))
        .where(col("day") <= col("mx"))
        .groupBy("day").agg(count_distinct(col("user_id")).as("wau"))
      wau.join(dau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
        .orderBy("day")
    }),

    // Behavioral transition matrix: counts + row-normalized probabilities
    // of consecutive event-type transitions per user (the first-order
    // Markov summary behind funnel design and bot detection). One lag
    // window per user partition (distributes on user_id), then a bounded
    // (type x type) aggregate; the 5-row per-source totals re-enter via a
    // broadcast join. Fraction = one IEEE division off exact longs, r6.
    "ts_transition_matrix" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = trans.groupBy("from_type").agg(sum(col("n")).as("tot"))
      trans.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          r6(col("n").cast("double") / col("tot").cast("double")).as("p"))
        .orderBy("from_type", "to_type")
    }),

    // Hour-of-day seasonality baseline + spike flags (r6): per
    // (event_type, hour-of-day) the expected hourly count over the
    // ZERO-FILLED grid (a silent hour is 0 activity, not missing data —
    // gap_fill's whole point), then each concrete hour compared against
    // 2x its seasonal baseline. The spike test is pure integer cross-
    // multiplication (cnt * n_hod > 2 * sum_hod) — no division, no
    // rounding, no cross-engine FP risk; `expected` is display-only
    // (exact integer sum -> one fixed division, r6). Shape: the bounded
    // grid aggregates to a 24 x |types| baseline that broadcast-joins
    // back — all post-scan work is grid-cardinality.
    "ts_seasonal_baseline" -> ((s, d) => {
      val gf = hourlyGrid(s, d).withColumn("hod", hour(col("h")))
      val base = gf.groupBy("event_type", "hod")
        .agg(sum(col("cnt")).as("s_hod"), count(lit(1)).as("n_hod"))
      gf.join(broadcast(base), Seq("event_type", "hod"))
        .select(col("event_type"), col("h"), col("cnt"), col("hod"),
          r6(col("s_hod").cast("double") / col("n_hod").cast("double")).as("expected"),
          (col("cnt") * col("n_hod") > col("s_hod") * 2).as("is_spike"))
        .orderBy("event_type", "h")
    }),

    // Classical seasonal decomposition (r6d) — STL-lite over the gap-
    // filled hourly grid: trend = 24-hour centered moving average (ROWS
    // 12 PRECEDING..11 FOLLOWING, partitioned by event_type — a window
    // over the BOUNDED grid, never the event stream), seasonal = hour-
    // of-day mean of the detrended series, residual = the rest. Cross-
    // engine exactness by common denominator: only COMPLETE windows
    // survive (w_n = 24), so the detrended value scales to the exact
    // integer det24 = 24*cnt - w_sum, the seasonal sum s24 is an
    // order-free integer sum, and every emitted double is exact-ints ->
    // ONE fixed-order formula (trend/seasonal/resid share the formula
    // strings with the oracle). The event scan still ends at the hourly
    // count aggregate — all window/seasonal work is grid-cardinality.
    "ts_decompose" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-12, 11)
      val win = hourlyGrid(s, d)
        .withColumn("w_sum", sum("cnt").over(w))
        .withColumn("w_n", count(lit(1)).over(w))
      val interior = win.where(col("w_n") === 24)
        .withColumn("hod", hour(col("h")))
        .withColumn("det24", lit(24) * col("cnt") - col("w_sum"))
      val seas = interior.groupBy("event_type", "hod")
        .agg(sum("det24").as("s24"), count(lit(1)).as("n_hod"))
      interior.join(broadcast(seas), Seq("event_type", "hod"))
        .selectExpr("event_type", "h", "hod", "cnt",
          s"((CASE WHEN isnan(($decTrendF)) OR abs(($decTrendF)) >= 9e12 THEN CAST(($decTrendF) AS DOUBLE) ELSE CAST(floor(($decTrendF) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS trend",
          s"((CASE WHEN isnan(($decSeasF)) OR abs(($decSeasF)) >= 9e12 THEN CAST(($decSeasF) AS DOUBLE) ELSE CAST(floor(($decSeasF) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS seasonal",
          s"((CASE WHEN isnan(($decResidF)) OR abs(($decResidF)) >= 9e12 THEN CAST(($decResidF) AS DOUBLE) ELSE CAST(floor(($decResidF) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS resid")
        .orderBy("event_type", "h")
    }),

    // Rolling discrete median (r6e) — the robust twin of ts_ema_smooth
    // (a mean-based smoother chases spikes; the trailing-24h median
    // ignores them): per type over the gap-filled hourly grid, the
    // window's sorted counts picked at the agg_percentile_disc integer
    // position ((n-1)*1 DIV 2 + 1). EXACT end to end — the median of
    // integer counts is an integer, no FP anywhere, nothing to round.
    // The window is over the BOUNDED grid (ts_decompose's argument):
    // width 24 and the (type x hour) key space are data-size
    // independent, so the sort-per-window cost is grid-cardinality,
    // never event-cardinality.
    "ts_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-23, 0)
      hourlyGrid(s, d)
        .withColumn("win", collect_list("cnt").over(w))
        .selectExpr("event_type", "h", "cnt",
          "CAST(size(win) AS INT) AS w_n",
          "element_at(array_sort(win), CAST(((size(win) - 1) DIV 2) + 1 AS INT)) AS med")
        .orderBy("event_type", "h")
    }),

    // CUSUM changepoint detection (r6d) — the pipeline-health gauge for
    // "did the event volume regime shift mid-window": per-day counts on
    // the zero-filled contiguous day grid, deviations-from-mean folded
    // into the cumulative sum S_k = n*cum_k - k*total (the exact integer
    // cross-multiplication form — n*c_i - total per day, summed — so no
    // mean is ever materialized and nothing is FP until display), the
    // changepoint is argmax |S_k| (min-struct argmax, ties to the
    // earlier day). Cumulative counts via the bounded day-grid self-join
    // (the dq_ks_drift shape — never a partitionless window). The scan
    // ends at the per-day count; all downstream work is grid-bounded.
    "ts_changepoint" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
      val cnts = ev.groupBy("day").agg(count(lit(1)).as("cnt"))
      val bounds = cnts.agg(min("day").as("mind"), max("day").as("maxd"))
      val grid = bounds.select(explode(sequence(col("mind"), col("maxd"))).as("day"))
      val filled = grid.join(cnts, Seq("day"), "left")
        .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val totals = filled.agg(count(lit(1)).as("n_days"), sum("cnt").as("total"))
      val cum = filled.as("a")
        .join(filled.as("b"), col("b.day") <= col("a.day"))
        .groupBy(col("a.day").as("day"), col("a.cnt").as("cnt"))
        .agg(count(lit(1)).as("k"), sum(col("b.cnt")).as("cum"))
      val scored = cum.crossJoin(broadcast(totals))
        .selectExpr("day", "cnt", "k", "cum",
          "n_days * cum - k * total AS cusum")
      val cp = scored.agg(min(struct((-abs(col("cusum"))).as("ns"),
          col("day").as("d"))).as("m"))
        .crossJoin(broadcast(totals))
        .selectExpr("m.d AS cp_day", "-m.ns AS cp_snum", "n_days", "total")
        .selectExpr("cp_day", s"((CASE WHEN isnan(($cusumStatFormula)) OR abs(($cusumStatFormula)) >= 9e12 THEN CAST(($cusumStatFormula) AS DOUBLE) ELSE CAST(floor(($cusumStatFormula) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS cp_stat")
      scored.select(col("day"), col("cnt"), col("k"), col("cum"), col("cusum"))
        .crossJoin(broadcast(cp))
        .orderBy("day")
    }),

    // Generalized-ESD outlier peeling (r11) — the iterative twin of
    // ts_changepoint's one-shot CUSUM: three Rosner rounds, each
    // computing mean/sd over the REMAINING days (exact integer moments
    // → fixed-order doubles; sqrt correctly rounded), flagging the
    // max-|deviation| day (ties to the earlier day) and removing it —
    // the masked-outlier detector a single z-pass cannot be (one huge
    // spike inflates sd and hides the second). The t-based critical
    // values are the consumer's table lookup; the engine emits the R_r
    // statistics. Runs DRIVER-SIDE over the bounded one-row-per-day
    // grid (the kmeans/pca/mmr driver-math class: deterministic Scala
    // on a bounded collect == SQL — BigInt sums mirror HUGEINT, minBy
    // on (-absdev, day) mirrors the min-struct argmax), because an
    // in-plan version would chain a per-round scalar broadcast (the
    // graph_hits O(rounds²) trap) for a 3-row emission. Oracle = three
    // unrolled CTE rounds with the identical op chain.
    "ts_esd_outliers" -> ((s, d) => {
      import s.implicits._
      val grid = Tables.events(s, d)
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").agg(count(lit(1)).as("cnt"))
        .transform(graft.operators.Scale.materialize) // two consumers (bounds + filled join): one events scan
      val bounds = grid.agg(min("day").as("mn"), max("day").as("mx"))
      val filled = bounds.select(explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(grid, Seq("day"), "left")
        .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      var rem = filled.collect().map(r => (r.getLong(0), r.getLong(1))).toVector
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Double)]
      for (r <- 1 to 3) {
        val n = rem.length
        val s1 = rem.map(t => BigInt(t._2)).sum
        val s2 = rem.map(t => BigInt(t._2) * BigInt(t._2)).sum
        val mean = s1.toDouble / n.toDouble
        val sd = math.sqrt(
          (s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble) / (n.toDouble - 1.0))
        val pick = rem.minBy { case (dd, c) => (-math.abs(c.toDouble - mean), dd) }
        val rstat = if (sd == 0.0) 0.0 else math.abs(pick._2.toDouble - mean) / sd
        out += ((r, pick._1, pick._2, n.toLong, rstat))
        rem = rem.filterNot(_._1 == pick._1)
      }
      out.toSeq.toDF("round", "day", "cnt", "n_remaining", "r_raw")
        .selectExpr("CAST(round AS INT) AS round", "day", "cnt", "n_remaining",
          s"${Qutil.r6Sql("r_raw")} AS r_stat")
        .orderBy("round")
    }),

    // Mann-Kendall trend test (r11) — the NONPARAMETRIC trend gauge next
    // to ts_changepoint's regime-shift CUSUM: per event type over the
    // zero-filled daily grid, S = Σ_{i<j} sign(y_j − y_i) counts
    // concordant minus discordant day pairs (monotone-trend evidence
    // with NO distributional assumption — robust where Holt/regression
    // chase outliers). EXACT INTEGER throughout: S from a sign CASE over
    // the bounded (type × day-pair) grid self-join, the tie-corrected
    // variance numerator vn = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5) from
    // per-value tie counts, and the z statistic is the ONE FP step —
    // (S∓1)/sqrt(vn/18) in a shared fixed-order formula (sqrt is
    // correctly rounded on both engines, so r6 display rounding holds).
    // Scale shape: the scan ends at the per-(type, day) count; the grid
    // is BOUNDED (types × days, data-size independent), checkpointed
    // once for its two consumers, and the pair join carries the
    // explicit broadcast the LogicalRDD stats-free rule requires.
    "ts_mk_trend" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("event_type", "unix_micros(ts) DIV 86400000000 AS day")
      val cnts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        .transform(graft.operators.Scale.materialize) // three consumers (bounds, distinct types, filled join): one events scan
      val bounds = cnts.agg(min("day").as("mind"), max("day").as("maxd"))
      val grid = cnts.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(sequence(col("mind"), col("maxd"))).as("day"))
      val filled = grid.join(cnts, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .transform(graft.operators.Scale.materialize)
      val sgn = filled.as("a").join(broadcast(filled.as("b")),
          col("a.event_type") === col("b.event_type") && col("b.day") < col("a.day"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(when(col("a.cnt") > col("b.cnt"), 1L)
          .when(col("a.cnt") < col("b.cnt"), -1L).otherwise(0L)).as("s_mk"))
      val ties = filled.groupBy("event_type", "cnt").agg(count(lit(1)).as("tg"))
        .groupBy("event_type")
        .agg(sum(expr("tg * (tg - 1) * (2 * tg + 5)")).as("tie_term"),
          sum(col("tg")).as("n_days"))
      sgn.join(ties, "event_type")
        .selectExpr("event_type", "n_days", "s_mk",
          "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS vn")
        .selectExpr("event_type", "n_days", "s_mk", "vn",
          s"${Qutil.r6Sql(mkZFormula)} AS z_mk", s"$mkTrendFormula AS trend")
        .orderBy("event_type")
    }),

    // Theil–Sen slope (r12) — the robust TREND MAGNITUDE next to
    // ts_mk_trend's S-test (MK answers "is there a monotone trend";
    // Theil–Sen answers "how steep", immune to outliers a least-squares
    // slope chases): per event type, the median of all day-pair slopes
    // (c_j − c_i)/(j − i) over the zero-filled grid. EXACT INTEGER
    // median selection — slopes stay (num, den) rationals and every
    // comparison is the cross-multiplication num_q·den_p < num_p·den_q
    // (dens positive), so the k-th order statistic (k = (P+1) DIV 2,
    // the agg_percentile_disc discrete rule) is found by per-element
    // less/equal counts with NO floating point anywhere; the ONE FP
    // step is the final num/den division (correctly rounded both
    // engines, r6). Multiple (num, den) representatives of the median
    // ratio all divide to the SAME double (identical real quotient ⇒
    // identical rounded result), so the min-aggregate emission is
    // value-stable. Scale shape: the scan ends at the per-(type, day)
    // count; pairs and the comparison self-join are GRID-bounded
    // (days², data-size independent), checkpointed once, explicit
    // broadcasts per the LogicalRDD rule.
    "ts_theil_sen" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("event_type", "unix_micros(ts) DIV 86400000000 AS day")
      val cnts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        .transform(graft.operators.Scale.materialize)
      val bounds = cnts.agg(min("day").as("mind"), max("day").as("maxd"))
      val grid = cnts.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(sequence(col("mind"), col("maxd"))).as("day"))
      val filled = grid.join(cnts, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .transform(graft.operators.Scale.materialize)
      // multiplicity-compressed slope rationals per type
      val pr = filled.as("a").join(broadcast(filled.as("b")),
          col("a.event_type") === col("b.event_type") &&
            col("b.day") > col("a.day"))
        .groupBy(col("a.event_type").as("event_type"),
          (col("b.cnt") - col("a.cnt")).as("num"),
          (col("b.day") - col("a.day")).as("den"))
        .agg(count(lit(1)).as("m"))
        .transform(graft.operators.Scale.materialize)
      val tot = pr.groupBy("event_type").agg(sum("m").as("p_total"))
      pr.as("p").join(broadcast(pr.as("q")),
          col("p.event_type") === col("q.event_type"))
        .groupBy(col("p.event_type").as("event_type"),
          col("p.num").as("num"), col("p.den").as("den"))
        .agg(sum(when(expr("q.num * p.den < p.num * q.den"), col("q.m"))
            .otherwise(0L)).as("less"),
          sum(when(expr("q.num * p.den = p.num * q.den"), col("q.m"))
            .otherwise(0L)).as("eq"))
        .join(broadcast(tot), Seq("event_type"))
        .where(expr("less < (p_total + 1) DIV 2 AND (p_total + 1) DIV 2 <= less + eq"))
        .groupBy(col("event_type"))
        .agg(max("p_total").as("n_pairs"),
          min(expr(Qutil.r6Sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)")))
            .as("sen_slope"))
        .orderBy("event_type")
    }),

    // Cross-correlation lead-lag scan (r12) — WHICH series leads which:
    // the CCF between every ordered event-type pair at daily lags −3..+3
    // (ts_autocorr is the within-series twin; this is the cross-series
    // member that answers "do cart events lead purchases, and by how many
    // days" — the causal-ordering gauge a pipeline consults before
    // building lagged features). Same exact-integer formulation: per-type
    // zero-filled daily grid, deviations scaled through by n (dev = n·c −
    // S, exact BIGINT), num/den sums in DECIMAL(38,0) (HUGEINT mirror),
    // and the ONE FP step is the shared ccfF formula — num / (√den_a ·
    // √den_b), each cast/sqrt/multiply correctly rounded in a fixed
    // order, round 6; constant series emit NULL via integer predicates.
    // Scale shape: the scan ends at the per-(type, day) count; the grid
    // checkpoints once (multi-consumer rule), the signed-lag pairing is
    // the bounded-grid broadcast self-join with the explicit hint (the
    // LogicalRDD rule), den joins back twice as bounded broadcasts.
    "ts_lead_lag" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("event_type", "unix_micros(ts) DIV 86400000000 AS day")
      val cnts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
        .transform(graft.operators.Scale.materialize)
      val bounds = cnts.agg(min("day").as("mind"), max("day").as("maxd"))
      val grid = cnts.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(sequence(col("mind"), col("maxd"))).as("day"))
      val filled = grid.join(cnts, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .transform(graft.operators.Scale.materialize)
      val st = filled.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"))
      val nc = filled.join(broadcast(st), Seq("event_type"))
        .selectExpr("event_type", "day", "n * cnt - s AS dev")
        .transform(graft.operators.Scale.materialize)
      val den = nc.groupBy("event_type")
        .agg(sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("den"))
      nc.as("a").join(broadcast(nc.as("b")),
          col("a.event_type") < col("b.event_type") &&
            (col("b.day") - col("a.day")).between(-3, 3))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          (col("b.day") - col("a.day")).as("lag"))
        .agg(sum(expr("CAST(a.dev AS DECIMAL(38,0)) * b.dev")).as("num"),
          count(lit(1)).as("n_overlap"))
        .join(broadcast(den.selectExpr("event_type AS type_a", "den AS dena")),
          Seq("type_a"))
        .join(broadcast(den.selectExpr("event_type AS type_b", "den AS denb")),
          Seq("type_b"))
        .selectExpr("type_a", "type_b", "lag", "n_overlap", s"$ccfF AS ccf")
        .orderBy("type_a", "type_b", "lag")
    }),

    // LTTB downsampling (r9) — the dashboard-grade series reducer
    // (Steinarsson's Largest-Triangle-Three-Buckets, mean-anchor
    // variant): pick ONE visually-dominant point per bucket — the one
    // maximizing the triangle area against the NEIGHBOR buckets' mean
    // points — plus the pinned first/last endpoints. The anchor means
    // are rationals s/n, so every area is multiplied through by
    // np²·nn: four BIGINT factors (day grain is bounded — days don't
    // scale with data, only counts do), each CAST DECIMAL(19,0) before
    // the cross-products so the products are DECIMAL(38,0)-exact on
    // both engines at any count magnitude (the ks/emd rule) — the
    // argmax compares exact integers, nothing FP anywhere. Shape: the
    // bucketed day frame checkpoints once (3 consumers), the 10-row
    // mean frame broadcasts to its ±1-shifted joins, selection is the
    // (-area, day) min-struct AGGREGATE carrying cnt.
    "ts_downsample_lttb" -> ((s, d) => {
      val dc = Tables.events(s, d)
        .selectExpr("unix_micros(ts) DIV 86400000000 AS day")
        .groupBy("day").agg(count(lit(1)).as("cnt"))
      val bounds = dc.agg(min("day").as("mn"), max("day").as("mx"))
      val bk = dc.crossJoin(broadcast(bounds))
        .selectExpr("CAST(((day - mn) * 10) DIV (mx - mn + 1) AS INT) AS bucket",
          "day", "cnt")
        .transform(graft.operators.Scale.materialize)
      val m = bk.groupBy("bucket")
        .agg(sum("day").as("sx"), sum("cnt").as("sy"), count(lit(1)).as("n"))
        .transform(graft.operators.Scale.materialize)
      val mp = m.selectExpr("bucket + 1 AS bucket", "sx AS sxp", "sy AS syp", "n AS np")
      val mc = m.selectExpr("bucket - 1 AS bucket", "sx AS sxc", "sy AS syc", "n AS nn")
      val sel = bk.where(col("bucket").between(1, 8))
        .join(broadcast(mp), "bucket").join(broadcast(mc), "bucket")
        .selectExpr("bucket", "day", "cnt", s"-($lttbAreaExpr) AS na")
        .groupBy("bucket")
        .agg(min(struct(col("na"), col("day").as("dy"), col("cnt").as("c"))).as("s"))
        .selectExpr("bucket", "s.dy AS day", "s.c AS cnt")
      val first = bk.where(col("bucket") === 0)
        .agg(min(struct(col("day").as("dy"), col("cnt").as("c"))).as("s"))
        .selectExpr("0 AS bucket", "s.dy AS day", "s.c AS cnt")
      val last = bk.where(col("bucket") === 9)
        .agg(min(struct((-col("day")).as("nd"), col("cnt").as("c"))).as("s"))
        .selectExpr("9 AS bucket", "-s.nd AS day", "s.c AS cnt")
      first.union(sel).union(last).orderBy("bucket")
    }),

    // CDC "last write wins": latest event per (user, type) — the Salesforce
    // upsert-compaction the reference's migration performs per object.
    "ts_dedup_latest" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    })
  )

  /** DuckDB mirror of hourlyGrid (shared by the ts_gap_fill and
    * ts_rolling_corr oracles — one grid definition, the pqChainSql
    * rule). range stop is exclusive (Spark sequence inclusive): +1.
    * Lateral column args work for unnest(range(...)) in a subquery
    * (generate_series rejects them — text_chunk precedent). */
  private def gridCtesSql: String =
    "ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events), " +
      "c AS (SELECT event_type, h, COUNT(*) AS cnt FROM ev GROUP BY 1,2), " +
      "b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM c), " +
      "t AS (SELECT DISTINCT event_type FROM c), " +
      "g0 AS (SELECT event_type, mn, unnest(range(0, date_diff('hour', mn, mx) + 1)) AS i " +
      "FROM t CROSS JOIN b), " +
      "g AS (SELECT event_type, mn + to_hours(i) AS h FROM g0), " +
      "gf AS (SELECT g.event_type, g.h, COALESCE(c.cnt, 0) AS cnt FROM g " +
      "LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h)"

  /** Rolling Pearson correlation off the exact integer window moments —
    * shared formula string (sqrt-based, so round 6 holds: the geomean
    * rule exempts sqrt); zero-variance windows emit NULL via an
    * all-integer predicate. */
  /** ACF emission off the exact DECIMAL(38,0)/HUGEINT moment sums — one
    * correctly-rounded cast per operand, one division, round 6 (shared
    * formula string; constant series emit NULL via an integer predicate). */
  private def acfF: String =
    "CASE WHEN den > 0 THEN " +
      "((CASE WHEN isnan((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))) OR abs((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))) >= 9e12 THEN CAST((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) AS DOUBLE) ELSE CAST(floor((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) END"

  /** CCF emission off the exact DECIMAL(38,0)/HUGEINT moment sums —
    * num / (√den_a · √den_b): each decimal→double cast, each sqrt, and
    * the one multiply/divide are correctly rounded in a fixed order on
    * both engines (sqrt(x)·sqrt(y), never sqrt(x·y) — the product could
    * overflow the exact integer domain at scale; the factored form
    * stays in doubles), round 6; constant series → NULL via the
    * integer predicate. */
  private def ccfF: String = {
    val e = "CAST(num AS DOUBLE) / (sqrt(CAST(dena AS DOUBLE)) * sqrt(CAST(denb AS DOUBLE)))"
    s"CASE WHEN dena > 0 AND denb > 0 THEN ${Qutil.r6Sql(e)} END"
  }

  private def rollCorrSql: String =
    "CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN " +
      "((CASE WHEN isnan((CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
      "sqrt(CAST(n * syy - sy * sy AS DOUBLE))))) OR abs((CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
      "sqrt(CAST(n * syy - sy * sy AS DOUBLE))))) >= 9e12 THEN CAST((CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
      "sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS DOUBLE) ELSE CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
      "sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) END"

  /** LTTB scaled triangle area over (day, cnt) vs the ±1-bucket mean
    * anchors (sxp/syp/np, sxc/syc/nn) — ONE fixed-order string shared
    * by the Spark selection and the oracle (a def — the ts_decompose
    * init-order rule): BIGINT factors, DECIMAL(19,0) casts before the
    * cross-products so both engines multiply exactly at any count
    * magnitude. */
  private def lttbAreaExpr: String =
    // shoelace: the two cross-products SUM (r9 shipped a '-' here —
    // anchors (0,0)/(4,1), candidate (2,3) gave 14, true 2A is 10;
    // caught by the r9 advisor. PropertySpec's reference walk now uses
    // the independent expanded shoelace spelling so a shared sign flip
    // cannot pass again).
    "abs(CAST(sxp * nn - sxc * np AS DECIMAL(19,0)) * CAST(cnt * np - syp AS DECIMAL(19,0)) + " +
      "CAST(sxp - day * np AS DECIMAL(19,0)) * CAST(syp * nn - syc * np AS DECIMAL(19,0)))"

  val oracle: Map[String, String] = Map(
    "ts_downsample_lttb" ->
      // same bucket/mean/anchor chain; struct_pack argmax carrying cnt
      ("WITH dc AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
       "CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), " +
       "bo AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM dc), " +
       "bk AS (SELECT CAST(((day - mn) * 10) // (mx - mn + 1) AS INT) AS bucket, day, cnt " +
       "FROM dc CROSS JOIN bo), " +
       "m AS (SELECT bucket, CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(cnt) AS BIGINT) AS sy, " +
       "CAST(COUNT(*) AS BIGINT) AS n FROM bk GROUP BY 1), " +
       "cand AS (SELECT b.bucket, b.day, b.cnt, p.sx AS sxp, p.sy AS syp, p.n AS np, " +
       "x.sx AS sxc, x.sy AS syc, x.n AS nn " +
       "FROM bk b JOIN m p ON p.bucket = b.bucket - 1 JOIN m x ON x.bucket = b.bucket + 1 " +
       "WHERE b.bucket BETWEEN 1 AND 8), " +
       s"sel AS (SELECT bucket, (MIN(struct_pack(na := -($lttbAreaExpr), dy := day, c := cnt))).dy AS day, " +
       s"(MIN(struct_pack(na := -($lttbAreaExpr), dy := day, c := cnt))).c AS cnt FROM cand GROUP BY 1), " +
       "fl AS (SELECT 0 AS bucket, (MIN(struct_pack(dy := day, c := cnt))).dy AS day, " +
       "(MIN(struct_pack(dy := day, c := cnt))).c AS cnt FROM bk WHERE bucket = 0), " +
       "la AS (SELECT 9 AS bucket, -((MIN(struct_pack(nd := -day, c := cnt))).nd) AS day, " +
       "(MIN(struct_pack(nd := -day, c := cnt))).c AS cnt FROM bk WHERE bucket = 9) " +
       "SELECT bucket, day, cnt FROM " +
       "(SELECT * FROM fl UNION ALL SELECT * FROM sel UNION ALL SELECT * FROM la) " +
       "ORDER BY bucket"),
    "ts_forecast_eval" ->
      // the identical recurrence on the train prefix (last 3 days held
      // out), exact integer errors, the shared wapeF division
      ("WITH RECURSIVE g AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
       "COUNT(*) AS cnt FROM events GROUP BY 1), " +
       "gr AS (SELECT day, cnt, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn FROM g), " +
       "nn AS (SELECT MAX(rn) AS n FROM gr), " +
       "tr AS (SELECT gr.rn, gr.cnt FROM gr CROSS JOIN nn WHERE rn <= n - 3), " +
       "st AS (SELECT rn, cnt * 1000000 AS l, CAST(0 AS BIGINT) AS b FROM tr WHERE rn = 1 " +
       "UNION ALL SELECT g2.rn, (g2.cnt * 1000000 + st.l + st.b) // 2, " +
       "((g2.cnt * 1000000 + st.l + st.b) // 2 - st.l) // 4 + (3 * st.b) // 4 " +
       "FROM st JOIN tr g2 ON g2.rn = st.rn + 1), " +
       "fin AS (SELECT l, b FROM st ORDER BY rn DESC LIMIT 1), " +
       "te AS (SELECT CAST(rn - (n - 3) AS BIGINT) AS h, day, cnt FROM gr " +
       "CROSS JOIN nn WHERE rn > n - 3), " +
       "fc AS (SELECT h, day, cnt AS actual, l + h * b AS forecast_u, " +
       "abs(l + h * b - cnt * 1000000) AS abs_err_u FROM te CROSS JOIN fin), " +
       "agg AS (SELECT CAST(SUM(abs_err_u) AS BIGINT) AS sum_abs, " +
       "CAST(SUM(actual) * 1000000 AS BIGINT) AS sum_act FROM fc) " +
       s"SELECT h, day, actual, forecast_u, abs_err_u, $wapeF AS wape " +
       "FROM fc CROSS JOIN agg ORDER BY h"),
    "ts_concurrency" ->
      // the shared session CTEs verbatim; range stop +1 mirrors the
      // inclusive Spark sequence
      (s"WITH ${JoinQueries.sessionCtes("v", "view")}, " +
       "hb AS (SELECT user_id, unnest(range(st // 3600000000, (en // 3600000000) + 1)) AS hr FROM gv) " +
       "SELECT hr, CAST(COUNT(*) AS BIGINT) AS n_sessions, " +
       "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users " +
       "FROM hb GROUP BY 1 ORDER BY hr"),
    "ts_dow_hour_heatmap" ->
      // DuckDB dayofweek == Spark dayofweek − 1; identical dense grid,
      // HUGEINT cent sums cast back, zero-filled
      ("WITH ev AS (SELECT CAST(dayofweek(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hr, " +
       "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events), " +
       "c AS (SELECT dow, hr, CAST(COUNT(*) AS BIGINT) AS n, " +
       "SUM(CAST(cents AS HUGEINT)) AS sc FROM ev GROUP BY 1, 2), " +
       "g AS (SELECT CAST(d.d AS INT) AS dow, CAST(h.h AS INT) AS hr FROM " +
       "(SELECT unnest(range(0, 7)) AS d) d CROSS JOIN (SELECT unnest(range(0, 24)) AS h) h) " +
       "SELECT g.dow, g.hr, COALESCE(n, CAST(0 AS BIGINT)) AS n, " +
       "COALESCE(CAST(sc AS BIGINT), CAST(0 AS BIGINT)) AS cents " +
       "FROM g LEFT JOIN c ON g.dow = c.dow AND g.hr = c.hr ORDER BY g.dow, g.hr"),
    "ts_period_over_period" ->
      // identical month index, HUGEINT cent sums, two left self-joins,
      // the shared popPctF strings; // == DIV on the nonnegative midx
      ("WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) * 12 + month(o_orderdate) - 1 AS midx, " +
       "CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT)) AS sc FROM orders GROUP BY 1) " +
       "SELECT a.midx, a.midx // 12 AS yr, a.midx % 12 + 1 AS mo, a.n_orders, " +
       "CAST(a.sc AS BIGINT) AS cents, CAST(a.sc - p.sc AS BIGINT) AS mom_delta_cents, " +
       s"${popPctF("a.sc", "p.sc")} AS mom_pct, ${popPctF("a.sc", "y.sc")} AS yoy_pct " +
       "FROM m a LEFT JOIN m p ON a.midx = p.midx + 1 " +
       "LEFT JOIN m y ON a.midx = y.midx + 12 ORDER BY a.midx"),
    "ts_holt_forecast" ->
      // recursive CTE replaying the IDENTICAL integer recurrence over the
      // row-numbered day grid; integer // truncates toward zero (== Scala /)
      ("WITH RECURSIVE g AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
       "COUNT(*) AS cnt FROM events GROUP BY 1), " +
       "gr AS (SELECT day, cnt, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn FROM g), " +
       "st AS (SELECT rn, day, cnt, cnt * 1000000 AS l, CAST(0 AS BIGINT) AS b, " +
       "cnt * 1000000 AS fitted FROM gr WHERE rn = 1 " +
       "UNION ALL SELECT g2.rn, g2.day, g2.cnt, " +
       "(g2.cnt * 1000000 + st.l + st.b) // 2, " +
       "((g2.cnt * 1000000 + st.l + st.b) // 2 - st.l) // 4 + (3 * st.b) // 4, " +
       "st.l + st.b FROM st JOIN gr g2 ON g2.rn = st.rn + 1), " +
       "lastst AS (SELECT * FROM st ORDER BY rn DESC LIMIT 1) " +
       "SELECT day, 'fit' AS row_type, cnt, l AS level_u, b AS trend_u, fitted AS fitted_u FROM st " +
       "UNION ALL SELECT lastst.day + h.h, 'forecast', NULL, lastst.l, lastst.b, " +
       "lastst.l + h.h * lastst.b FROM lastst CROSS JOIN " +
       "(SELECT unnest(range(1, 4)) AS h) h ORDER BY day"),
    "ts_unique_cumulative" ->
      ("WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events), " +
       "days AS (SELECT day, COUNT(*) AS n_events FROM ev GROUP BY 1), " +
       "f AS (SELECT user_id, MIN(day) AS fday FROM ev GROUP BY 1), " +
       "nu AS (SELECT fday AS day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY 1), " +
       "nd AS (SELECT d.day, d.n_events, COALESCE(nu.new_users, 0) AS new_users " +
       "FROM days d LEFT JOIN nu USING (day)) " +
       "SELECT a.day AS day, MAX(a.n_events) AS n_events, MAX(a.new_users) AS new_users, " +
       "CAST(SUM(g.new_users) AS BIGINT) AS cum_users " +
       "FROM nd a JOIN nd g ON g.day <= a.day GROUP BY 1 ORDER BY 1"),
    "ts_interarrival" ->
      ("WITH g AS (SELECT user_id, epoch_us(ts) AS us, " +
       "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us " +
       "FROM events), " +
       "h AS (SELECT us - prev_us AS gap_us FROM g WHERE prev_us IS NOT NULL) " +
       "SELECT CAST(length(bin(gap_us)) AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n, " +
       "MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us " +
       "FROM h GROUP BY 1 ORDER BY 1"),
    "ts_tumbling" ->
      ("SELECT date_trunc('hour', ts) AS wstart, event_type, COUNT(*) AS n, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
       "FROM events GROUP BY 1,2 ORDER BY 1,2"),
    "ts_sliding" ->
      ("SELECT wstart, COUNT(*) AS n FROM (" +
       "SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS wstart " +
       "FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k)" +
       ") GROUP BY 1 ORDER BY 1"),
    "ts_session" ->
      ("WITH marked AS (SELECT user_id, ts, value, " +
       "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
       "sess AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM marked) " +
       "SELECT user_id, MIN(ts) AS sess_start, MAX(ts) + INTERVAL 30 MINUTE AS sess_end, " +
       "COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
       "FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start"),
    "ts_gap_fill" ->
      (s"WITH $gridCtesSql " +
       "SELECT event_type, h, cnt FROM gf ORDER BY event_type, h"),
    "ts_rolling_corr" ->
      (s"WITH $gridCtesSql, " +
       "xy AS (SELECT epoch_us(h) // 3600000000 AS hi, " +
       "CAST(SUM(CASE WHEN event_type = 'view' THEN cnt ELSE 0 END) AS BIGINT) AS x, " +
       "CAST(SUM(CASE WHEN event_type = 'purchase' THEN cnt ELSE 0 END) AS BIGINT) AS y " +
       "FROM gf WHERE event_type IN ('view', 'purchase') GROUP BY 1), " +
       "w AS (SELECT a.hi AS hi, CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(b.x) AS BIGINT) AS sx, CAST(SUM(b.y) AS BIGINT) AS sy, " +
       "CAST(SUM(b.x * b.x) AS BIGINT) AS sxx, CAST(SUM(b.y * b.y) AS BIGINT) AS syy, " +
       "CAST(SUM(b.x * b.y) AS BIGINT) AS sxy " +
       "FROM xy a JOIN xy b ON b.hi >= a.hi - 23 AND b.hi <= a.hi GROUP BY 1) " +
       s"SELECT hi, $rollCorrSql AS corr24 FROM w WHERE n = 24 ORDER BY hi"),
    "ts_autocorr" ->
      // identical grid + the identical n-scaled deviation algebra; HUGEINT
      // sums mirror the DECIMAL(38,0) sums, formula string shared
      (s"WITH $gridCtesSql, " +
       "gh AS (SELECT event_type, epoch_us(h) // 3600000000 AS hi, " +
       "CAST(cnt AS BIGINT) AS cnt FROM gf), " +
       "st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(SUM(cnt) AS BIGINT) AS s FROM gh GROUP BY 1), " +
       "gd AS (SELECT gh.event_type, hi, n, n * cnt - s AS dev " +
       "FROM gh JOIN st USING (event_type)), " +
       "den AS (SELECT event_type, MAX(n) AS n, " +
       "SUM(CAST(dev AS HUGEINT) * dev) AS den FROM gd GROUP BY 1), " +
       "num AS (SELECT a.event_type AS event_type, b.hi - a.hi AS lag, " +
       "SUM(CAST(a.dev AS HUGEINT) * b.dev) AS num FROM gd a JOIN gd b " +
       "ON b.event_type = a.event_type AND b.hi BETWEEN a.hi + 1 AND a.hi + 12 " +
       "GROUP BY 1,2) " +
       s"SELECT num.event_type AS event_type, lag, n, $acfF AS acf " +
       "FROM num JOIN den USING (event_type) ORDER BY event_type, lag"),
    "ts_rolling_median" ->
      // same gap-fill CTE chain, DuckDB list() as the window aggregate,
      // the identical 1-based integer rank selection (list indexing is
      // 1-based like element_at; COALESCE cnt to BIGINT 0 keeps the
      // median BIGINT on both engines)
      ("WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events), " +
       "c AS (SELECT event_type, h, COUNT(*) AS cnt FROM ev GROUP BY 1,2), " +
       "b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM c), " +
       "t AS (SELECT DISTINCT event_type FROM c), " +
       "g0 AS (SELECT event_type, mn, unnest(range(0, date_diff('hour', mn, mx) + 1)) AS i " +
       "FROM t CROSS JOIN b), " +
       "g AS (SELECT event_type, mn + to_hours(i) AS h FROM g0), " +
       "gf AS (SELECT g.event_type, g.h, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt FROM g " +
       "LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h), " +
       "win AS (SELECT event_type, h, cnt, list(cnt) OVER " +
       "(PARTITION BY event_type ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS wl " +
       "FROM gf) " +
       "SELECT event_type, h, cnt, CAST(len(wl) AS INT) AS w_n, " +
       "list_sort(wl)[((len(wl) - 1) // 2) + 1] AS med " +
       "FROM win ORDER BY event_type, h"),
    "ts_ema_smooth" ->
      // weight 1.0/(1<<k): integer shift then one division — the same
      // exact power-of-two reciprocals as the Spark literal table
      ("WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events), " +
       "c AS (SELECT event_type, h, COUNT(*) AS cnt FROM ev GROUP BY 1,2), " +
       "b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM c), " +
       "t AS (SELECT DISTINCT event_type FROM c), " +
       "g0 AS (SELECT event_type, mn, unnest(range(0, date_diff('hour', mn, mx) + 1)) AS i " +
       "FROM t CROSS JOIN b), " +
       "g AS (SELECT event_type, mn + to_hours(i) AS h FROM g0), " +
       "gf AS (SELECT g.event_type, g.h, COALESCE(c.cnt, 0) AS cnt FROM g " +
       "LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h), " +
       "contrib AS (SELECT event_type, h + to_hours(k) AS h, " +
       "CAST(cnt AS DOUBLE) * (1.0 / CAST((1 << k) AS DOUBLE)) AS wc, " +
       "1.0 / CAST((1 << k) AS DOUBLE) AS w " +
       "FROM gf CROSS JOIN (SELECT unnest(range(0, 20)) AS k)), " +
       "e AS (SELECT event_type, h, SUM(wc) AS num, SUM(w) AS den " +
       "FROM contrib GROUP BY 1,2) " +
       "SELECT gf.event_type, gf.h, gf.cnt, ((CASE WHEN isnan((num / den)) OR abs((num / den)) >= 9e12 THEN CAST((num / den) AS DOUBLE) ELSE CAST(floor((num / den) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS ema " +
       "FROM gf JOIN e ON gf.event_type = e.event_type AND gf.h = e.h " +
       "ORDER BY gf.event_type, gf.h"),
    "ts_interpolate" ->
      ("WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h, value FROM events), " +
       "hc AS (SELECT event_type, h, ((CASE WHEN isnan((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) OR abs((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) >= 9e12 THEN CAST((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS v " +
       "FROM ev GROUP BY 1,2), " +
       "b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM hc), " +
       "t AS (SELECT DISTINCT event_type FROM hc), " +
       "g0 AS (SELECT event_type, mn, unnest(range(0, date_diff('hour', mn, mx) + 1)) AS i " +
       "FROM t CROSS JOIN b), " +
       "g AS (SELECT event_type, mn + to_hours(i) AS h FROM g0), " +
       "j AS (SELECT g.event_type, g.h, hc.v FROM g " +
       "LEFT JOIN hc ON g.event_type = hc.event_type AND g.h = hc.h), " +
       "w AS (SELECT event_type, h, v, " +
       "last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv, " +
       "last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph, " +
       "first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h " +
       "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, " +
       "first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h " +
       "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh FROM j) " +
       "SELECT event_type, h, " +
       "CASE WHEN v IS NOT NULL THEN v WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv " +
       "ELSE ((CASE WHEN isnan((pv + (nv - pv) * (CAST(date_diff('hour', ph, h) AS DOUBLE)" +
       "/CAST(date_diff('hour', ph, nh) AS DOUBLE)))) OR abs((pv + (nv - pv) * (CAST(date_diff('hour', ph, h) AS DOUBLE)" +
       "/CAST(date_diff('hour', ph, nh) AS DOUBLE)))) >= 9e12 THEN CAST((pv + (nv - pv) * (CAST(date_diff('hour', ph, h) AS DOUBLE)" +
       "/CAST(date_diff('hour', ph, nh) AS DOUBLE))) AS DOUBLE) ELSE CAST(floor((pv + (nv - pv) * (CAST(date_diff('hour', ph, h) AS DOUBLE)" +
       "/CAST(date_diff('hour', ph, nh) AS DOUBLE))) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) END AS v, " +
       "v IS NOT NULL AS observed " +
       "FROM w ORDER BY event_type, h"),
    "ts_funnel" ->
      ("WITH f AS (SELECT user_id, " +
       "MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view, " +
       "MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click, " +
       "MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy " +
       "FROM events GROUP BY 1), " +
       "c AS (SELECT " +
       "SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS n_view, " +
       "SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS n_view_click, " +
       "SUM(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 ELSE 0 END) AS n_view_click_buy " +
       "FROM f) " +
       "SELECT 'v_view' AS stage, CAST(n_view AS BIGINT) AS n_users FROM c " +
       "UNION ALL SELECT 'w_view_click', CAST(n_view_click AS BIGINT) FROM c " +
       "UNION ALL SELECT 'x_view_click_buy', CAST(n_view_click_buy AS BIGINT) FROM c " +
       "ORDER BY stage"),
    "ts_retention_cohort" ->
      ("WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), " +
       "c AS (SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY 1) " +
       "SELECT cohort_day, CAST(date_diff('day', cohort_day, d) AS INT) AS day_k, " +
       "COUNT(DISTINCT act.user_id) AS n_users " +
       "FROM act JOIN c USING (user_id) GROUP BY 1,2 ORDER BY 1,2"),
    "ts_transition_matrix" ->
      // SUM(BIGINT) -> HUGEINT in DuckDB: cast tot back (CLAUDE.md rule)
      ("WITH t AS (SELECT event_type AS from_type, " +
       "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type " +
       "FROM events), " +
       "c AS (SELECT from_type, to_type, COUNT(*) AS n FROM t " +
       "WHERE to_type IS NOT NULL GROUP BY 1, 2), " +
       "s AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1) " +
       "SELECT c.from_type, c.to_type, c.n, " +
       "((CASE WHEN isnan((CAST(c.n AS DOUBLE) / CAST(s.tot AS DOUBLE))) OR abs((CAST(c.n AS DOUBLE) / CAST(s.tot AS DOUBLE))) >= 9e12 THEN CAST((CAST(c.n AS DOUBLE) / CAST(s.tot AS DOUBLE)) AS DOUBLE) ELSE CAST(floor((CAST(c.n AS DOUBLE) / CAST(s.tot AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS p " +
       "FROM c JOIN s USING (from_type) ORDER BY from_type, to_type"),
    "ts_active_users" ->
      ("WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
       "b AS (SELECT MAX(day) AS mx FROM act), " +
       "dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM act GROUP BY 1), " +
       "w AS (SELECT user_id, day + k AS day FROM act " +
       "CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS k) kk " +
       "CROSS JOIN b WHERE day + k <= mx), " +
       "wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM w GROUP BY 1) " +
       // WAU side drives; zero-DAU days emit dau=0 (COALESCE kept BIGINT)
       "SELECT wau.day, CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau, wau.wau " +
       "FROM wau LEFT JOIN dau USING (day) ORDER BY day"),
    "ts_ohlc" ->
      // struct comparison is field-order lexicographic in BOTH engines, so
      // min/max over (ts, event_id, value) picks identical open/close rows
      ("SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n, " +
       "(MIN(struct_pack(ts := ts, event_id := event_id, value := value))).value AS open, " +
       "MAX(value) AS high, MIN(value) AS low, " +
       "(MAX(struct_pack(ts := ts, event_id := event_id, value := value))).value AS close " +
       "FROM events GROUP BY 1, 2 ORDER BY event_type, hr"),
    "ts_seasonal_baseline" ->
      // same gap-fill CTE chain as ts_gap_fill, then the 24 x |types|
      // baseline; spike = integer cross-multiplication, expected = one
      // fixed division r6; hour() is 0-23 on both engines (CAST pins INT)
      ("WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events), " +
       "c AS (SELECT event_type, h, COUNT(*) AS cnt FROM ev GROUP BY 1,2), " +
       "b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM c), " +
       "t AS (SELECT DISTINCT event_type FROM c), " +
       "g0 AS (SELECT event_type, mn, unnest(range(0, date_diff('hour', mn, mx) + 1)) AS i " +
       "FROM t CROSS JOIN b), " +
       "g AS (SELECT event_type, mn + to_hours(i) AS h FROM g0), " +
       "gf AS (SELECT g.event_type, g.h, CAST(hour(g.h) AS INT) AS hod, " +
       "COALESCE(c.cnt, 0) AS cnt FROM g " +
       "LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h), " +
       "base AS (SELECT event_type, hod, CAST(SUM(cnt) AS BIGINT) AS s_hod, " +
       "COUNT(*) AS n_hod FROM gf GROUP BY 1, 2) " +
       "SELECT gf.event_type, gf.h, gf.cnt, gf.hod, " +
       "((CASE WHEN isnan((CAST(s_hod AS DOUBLE) / CAST(n_hod AS DOUBLE))) OR abs((CAST(s_hod AS DOUBLE) / CAST(n_hod AS DOUBLE))) >= 9e12 THEN CAST((CAST(s_hod AS DOUBLE) / CAST(n_hod AS DOUBLE)) AS DOUBLE) ELSE CAST(floor((CAST(s_hod AS DOUBLE) / CAST(n_hod AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS expected, " +
       "gf.cnt * n_hod > s_hod * 2 AS is_spike " +
       "FROM gf JOIN base ON gf.event_type = base.event_type AND gf.hod = base.hod " +
       "ORDER BY gf.event_type, gf.h"),
    "ts_decompose" ->
      // same gap-fill CTE chain as ts_gap_fill/ts_seasonal_baseline, the
      // identical 24-row centered frame, complete-window filter, and the
      // shared trend/seasonal/resid formula strings; window SUM comes
      // back HUGEINT — cast before det24 so the integers stay BIGINT
      ("WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events), " +
       "c AS (SELECT event_type, h, COUNT(*) AS cnt FROM ev GROUP BY 1,2), " +
       "b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM c), " +
       "t AS (SELECT DISTINCT event_type FROM c), " +
       "g0 AS (SELECT event_type, mn, unnest(range(0, date_diff('hour', mn, mx) + 1)) AS i " +
       "FROM t CROSS JOIN b), " +
       "g AS (SELECT event_type, mn + to_hours(i) AS h FROM g0), " +
       "gf AS (SELECT g.event_type, g.h, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt FROM g " +
       "LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h), " +
       "win AS (SELECT event_type, h, cnt, CAST(SUM(cnt) OVER w AS BIGINT) AS w_sum, " +
       "CAST(COUNT(*) OVER w AS BIGINT) AS w_n FROM gf " +
       "WINDOW w AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)), " +
       "i AS (SELECT event_type, h, CAST(hour(h) AS INT) AS hod, cnt, w_sum, " +
       "24 * cnt - w_sum AS det24 FROM win WHERE w_n = 24), " +
       "se AS (SELECT event_type, hod, CAST(SUM(det24) AS BIGINT) AS s24, " +
       "CAST(COUNT(*) AS BIGINT) AS n_hod FROM i GROUP BY 1, 2) " +
       "SELECT i.event_type, i.h, i.hod, i.cnt, " +
       s"((CASE WHEN isnan(($decTrendF)) OR abs(($decTrendF)) >= 9e12 THEN CAST(($decTrendF) AS DOUBLE) ELSE CAST(floor(($decTrendF) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS trend, ((CASE WHEN isnan(($decSeasF)) OR abs(($decSeasF)) >= 9e12 THEN CAST(($decSeasF) AS DOUBLE) ELSE CAST(floor(($decSeasF) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS seasonal, " +
       s"((CASE WHEN isnan(($decResidF)) OR abs(($decResidF)) >= 9e12 THEN CAST(($decResidF) AS DOUBLE) ELSE CAST(floor(($decResidF) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS resid " +
       "FROM i JOIN se ON i.event_type = se.event_type AND i.hod = se.hod " +
       "ORDER BY i.event_type, i.h"),
    "ts_changepoint" ->
      // identical integer day/grid arithmetic (epoch_us // mirrors
      // unix_micros DIV), cumulative counts via the bounded grid
      // self-join, the min-struct argmax tie-break, the shared
      // cusumStatFormula division at emission
      ("WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day FROM events), " +
       "c AS (SELECT day, COUNT(*) AS cnt FROM ev GROUP BY 1), " +
       "b AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM c), " +
       "g0 AS (SELECT mind + unnest(range(0, maxd - mind + 1)) AS day FROM b), " +
       "f AS (SELECT g0.day, CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt " +
       "FROM g0 LEFT JOIN c ON g0.day = c.day), " +
       "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(cnt) AS BIGINT) AS total FROM f), " +
       "cum AS (SELECT a.day, a.cnt, CAST(COUNT(*) AS BIGINT) AS k, " +
       "CAST(SUM(b2.cnt) AS BIGINT) AS cum FROM f a JOIN f b2 ON b2.day <= a.day GROUP BY 1, 2), " +
       "sc AS (SELECT day, cnt, k, cum, n_days * cum - k * total AS cusum FROM cum CROSS JOIN t), " +
       "cpm AS (SELECT MIN(struct_pack(ns := -abs(cusum), d := day)) AS m FROM sc), " +
       "cp AS (SELECT (m).d AS cp_day, " +
       s"((CASE WHEN isnan((${cusumStatFormula.replace("cp_snum", "-(m).ns")})) OR abs((${cusumStatFormula.replace("cp_snum", "-(m).ns")})) >= 9e12 THEN CAST((${cusumStatFormula.replace("cp_snum", "-(m).ns")}) AS DOUBLE) ELSE CAST(floor((${cusumStatFormula.replace("cp_snum", "-(m).ns")}) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS cp_stat " +
       "FROM cpm CROSS JOIN t) " +
       "SELECT day, cnt, k, cum, cusum, cp_day, cp_stat " +
       "FROM sc CROSS JOIN cp ORDER BY day"),
    "ts_esd_outliers" ->
      // the changepoint grid CTEs, then three unrolled esdRoundSql
      // rounds; r6 at emission only
      ("WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day FROM events), " +
       "c AS (SELECT day, COUNT(*) AS cnt FROM ev GROUP BY 1), " +
       "b AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM c), " +
       "g0 AS (SELECT mind + unnest(range(0, maxd - mind + 1)) AS day FROM b), " +
       "f0 AS (SELECT g0.day, CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt " +
       "FROM g0 LEFT JOIN c ON g0.day = c.day), " +
       (1 to 3).map(esdRoundSql).mkString(", ") + " " +
       "SELECT CAST(round AS INT) AS round, day, cnt, n_remaining, " +
       s"${Qutil.r6Sql("r_raw")} AS r_stat FROM " +
       "(SELECT * FROM r1row UNION ALL SELECT * FROM r2row UNION ALL SELECT * FROM r3row) " +
       "ORDER BY round"),
    "ts_theil_sen" ->
      // the mk_trend grid CTEs; slope rationals multiplicity-compressed,
      // cross-multiplied order statistics (all BIGINT — num·den stays
      // tiny against the day-span bound), the discrete-median position
      // rule, ONE division at emission
      ("WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events), " +
       "c AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2), " +
       "b AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM c), " +
       "ty AS (SELECT DISTINCT event_type FROM c), " +
       "g AS (SELECT event_type, mind + unnest(range(0, maxd - mind + 1)) AS day FROM ty CROSS JOIN b), " +
       "f AS (SELECT g.event_type, g.day, CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt " +
       "FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.day = c.day), " +
       "pr AS (SELECT a.event_type, b2.cnt - a.cnt AS num, b2.day - a.day AS den, " +
       "CAST(COUNT(*) AS BIGINT) AS m FROM f a JOIN f b2 " +
       "ON a.event_type = b2.event_type AND b2.day > a.day GROUP BY 1, 2, 3), " +
       "tt AS (SELECT event_type, CAST(SUM(m) AS BIGINT) AS p_total FROM pr GROUP BY 1), " +
       "cj AS (SELECT p.event_type, p.num, p.den, " +
       "CAST(SUM(CASE WHEN q.num * p.den < p.num * q.den THEN q.m ELSE 0 END) AS BIGINT) AS less, " +
       "CAST(SUM(CASE WHEN q.num * p.den = p.num * q.den THEN q.m ELSE 0 END) AS BIGINT) AS eq " +
       "FROM pr p JOIN pr q ON p.event_type = q.event_type GROUP BY 1, 2, 3) " +
       "SELECT cj.event_type, MAX(p_total) AS n_pairs, " +
       s"MIN(${Qutil.r6Sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)")}) AS sen_slope " +
       "FROM cj JOIN tt ON cj.event_type = tt.event_type " +
       "WHERE less < (p_total + 1) // 2 AND (p_total + 1) // 2 <= less + eq " +
       "GROUP BY 1 ORDER BY 1"),
    "ts_lead_lag" ->
      // the mk_trend grid CTEs + the autocorr HUGEINT moment sums, with
      // the signed-lag cross-type pairing and the twice-joined den
      ("WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events), " +
       "c AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2), " +
       "b AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM c), " +
       "ty AS (SELECT DISTINCT event_type FROM c), " +
       "g AS (SELECT event_type, mind + unnest(range(0, maxd - mind + 1)) AS day FROM ty CROSS JOIN b), " +
       "f AS (SELECT g.event_type, g.day, CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt " +
       "FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.day = c.day), " +
       "st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS s FROM f GROUP BY 1), " +
       "nc AS (SELECT f.event_type, day, n * cnt - s AS dev FROM f JOIN st USING (event_type)), " +
       "den AS (SELECT event_type, SUM(CAST(dev AS HUGEINT) * dev) AS den FROM nc GROUP BY 1), " +
       "pr AS (SELECT a.event_type AS type_a, b2.event_type AS type_b, b2.day - a.day AS lag, " +
       "SUM(CAST(a.dev AS HUGEINT) * b2.dev) AS num, CAST(COUNT(*) AS BIGINT) AS n_overlap " +
       "FROM nc a JOIN nc b2 ON a.event_type < b2.event_type " +
       "AND b2.day - a.day BETWEEN -3 AND 3 GROUP BY 1, 2, 3) " +
       "SELECT type_a, type_b, lag, n_overlap, " +
       s"$ccfF AS ccf " +
       "FROM pr JOIN (SELECT event_type AS type_a, den AS dena FROM den) da USING (type_a) " +
       "JOIN (SELECT event_type AS type_b, den AS denb FROM den) db USING (type_b) " +
       "ORDER BY type_a, type_b, lag"),
    "ts_mk_trend" ->
      // identical integer grid (epoch_us // mirrors unix_micros DIV,
      // the per-type zero-fill), the same bounded pair self-join, tie
      // counts per (type, value), shared z/trend formulas; HUGEINT sums
      // cast back to BIGINT (the agg_mode rule)
      ("WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events), " +
       "c AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2), " +
       "b AS (SELECT MIN(day) AS mind, MAX(day) AS maxd FROM c), " +
       "ty AS (SELECT DISTINCT event_type FROM c), " +
       "g AS (SELECT event_type, mind + unnest(range(0, maxd - mind + 1)) AS day " +
       "FROM ty CROSS JOIN b), " +
       "f AS (SELECT g.event_type, g.day, CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt " +
       "FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.day = c.day), " +
       "sg AS (SELECT a.event_type, CAST(SUM(CASE WHEN a.cnt > b2.cnt THEN 1 " +
       "WHEN a.cnt < b2.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_mk " +
       "FROM f a JOIN f b2 ON a.event_type = b2.event_type AND b2.day < a.day GROUP BY 1), " +
       "tg AS (SELECT event_type, cnt, CAST(COUNT(*) AS BIGINT) AS tg FROM f GROUP BY 1, 2), " +
       "ti AS (SELECT event_type, CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_term, " +
       "CAST(SUM(tg) AS BIGINT) AS n_days FROM tg GROUP BY 1), " +
       "j AS (SELECT sg.event_type, n_days, s_mk, " +
       "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS vn " +
       "FROM sg JOIN ti ON sg.event_type = ti.event_type) " +
       s"SELECT event_type, n_days, s_mk, vn, ${Qutil.r6Sql(mkZFormula)} AS z_mk, " +
       s"$mkTrendFormula AS trend FROM j ORDER BY event_type"),
    "ts_dedup_latest" ->
      ("SELECT user_id, event_type, event_id, ts, value FROM " +
       "(SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn " +
       "FROM events) WHERE rn = 1 ORDER BY user_id, event_type")
  )

  /** THE CUSUM statistic emission — exact integer |S| numerator over the
    * exact n*total product, one division (shared-formula rule). */
  private def cusumStatFormula: String =
    "CAST(cp_snum AS DOUBLE) / (CAST(n_days AS DOUBLE) * CAST(total AS DOUBLE))"

  /** One unrolled ESD round over the remaining-day CTE f{k-1}: exact
    * HUGEINT moments → the identical fixed-order mean/sd, min-struct
    * argmax on (-absdev, day) mirroring the driver's minBy, the same
    * sd = 0 guard, then f{k} drops the picked day. */
  private def esdRoundSql(k: Int): String = {
    val f = s"f${k - 1}"
    s"m$k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(cnt AS HUGEINT)) AS s1, " +
      s"SUM(CAST(cnt AS HUGEINT) * cnt) AS s2 FROM $f), " +
      s"st$k AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, " +
      "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / " +
      s"(CAST(n AS DOUBLE) - 1.0)) AS sd FROM m$k), " +
      s"pk$k AS (SELECT MIN(struct_pack(nd := -abs(CAST(cnt AS DOUBLE) - mean), " +
      "d := day, c := cnt)) AS m, MAX(n) AS n, MAX(mean) AS mean, MAX(sd) AS sd " +
      s"FROM $f CROSS JOIN st$k), " +
      s"r$k" + "row AS (SELECT " + k + " AS round, (m).d AS day, (m).c AS cnt, " +
      "n AS n_remaining, CASE WHEN sd = 0 THEN CAST(0 AS DOUBLE) ELSE " +
      s"abs(CAST((m).c AS DOUBLE) - mean) / sd END AS r_raw FROM pk$k), " +
      s"f$k AS (SELECT day, cnt FROM $f WHERE day <> (SELECT day FROM r$k" + "row))"
  }

  /** Mann-Kendall z off the exact integer (s_mk, vn): continuity
    * correction S∓1 by integer sign CASE (never signum — return types
    * differ per engine), then division and sqrt in ONE fixed op order
    * (both correctly rounded IEEE, so bits match cross-engine). */
  private def mkZFormula: String =
    "(CASE WHEN vn <= 0 OR s_mk = 0 THEN CAST(0 AS DOUBLE) " +
      "WHEN s_mk > 0 THEN CAST(s_mk - 1 AS DOUBLE) / sqrt(CAST(vn AS DOUBLE) / CAST(18 AS DOUBLE)) " +
      "ELSE CAST(s_mk + 1 AS DOUBLE) / sqrt(CAST(vn AS DOUBLE) / CAST(18 AS DOUBLE)) END)"

  /** Trend label at the two-sided 5% level — the 1.96 threshold enters
    * as the exact division 196/100 (identical double bits both engines;
    * the raw z bits already match, so the compare cannot straddle). */
  private def mkTrendFormula: String =
    s"(CASE WHEN ($mkZFormula) > CAST(196 AS DOUBLE) / CAST(100 AS DOUBLE) THEN 'increasing' " +
      s"WHEN ($mkZFormula) < CAST(-196 AS DOUBLE) / CAST(100 AS DOUBLE) THEN 'decreasing' " +
      "ELSE 'none' END)"

  /** ts_decompose emission formulas over the exact integer columns
    * w_sum / det24 / s24 / n_hod — each term is exact-int -> one fixed
    * division, shared verbatim with the oracle. MUST be defs: the
    * oracle Map is an eagerly-initialized val textually above — a val
    * here interpolates as null into the SQL (object init order). */
  private def decTrendF = "CAST(w_sum AS DOUBLE) / 24.0"
  private def decSeasF = "CAST(s24 AS DOUBLE) / (24.0 * CAST(n_hod AS DOUBLE))"
  private def decResidF =
    "(CAST(det24 AS DOUBLE) / 24.0) - (CAST(s24 AS DOUBLE) / (24.0 * CAST(n_hod AS DOUBLE)))"
}
