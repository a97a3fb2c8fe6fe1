package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Qutil._

/** SURVEY §2.5 — window functions. Each window partitions by a natural key
  * (nation / user / customer) so the shuffle distributes; the formerly
  * global ntile/percent_rank window now runs as Scale.globalRank's
  * distributed two-pass form (no single-partition WindowExec — enforced
  * by PlanGuardSpec). */
object WindowQueries {

  val queries: Map[String, Q] = Map(
    // Top-3 customers per nation by balance (ties broken by key). Planner
    // applies WindowGroupLimit so only 3 rows per group survive the sort.
    "win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select("c_nationkey", "rnk", "c_custkey", "c_name", "c_acctbal")
        .orderBy("c_nationkey", "rnk")
    }),

    // Per-user inter-event gap (lag) + next event type (lead).
    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select("event_id", "user_id", "gap_us", "next_type")
        .orderBy("event_id")
    }),

    // Cumulative revenue per customer: ROWS UNBOUNDED PRECEDING..CURRENT.
    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("run_rev", emitD(sum(dec2(col("o_totalprice"))).over(w)))
        .select("o_custkey", "o_orderkey", "o_orderdate", "run_rev")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // 7-day trailing sum per user: RANGE frame over epoch seconds.
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
        .rangeBetween(-7L * 86400L, 0L)
      Tables.events(s, d)
        .withColumn("ts_sec", expr("unix_micros(ts) DIV 1000000"))
        .withColumn("trail_sum", emitD(sum(dec2(col("value"))).over(w)))
        .select("event_id", "user_id", "trail_sum")
        .orderBy("event_id")
    }),

    // first/last/nth value over the full partition frame per user.
    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("first_et", first(col("event_type")).over(w))
        .withColumn("last_et", last(col("event_type")).over(w))
        .withColumn("second_et", nth_value(col("event_type"), 2).over(w))
        .select("event_id", "user_id", "first_et", "last_et", "second_et")
        .orderBy("event_id")
    }),

    // Quartile / percent_rank / cume_dist of customers by balance —
    // DISTRIBUTED two-pass form (no global single-partition WindowExec;
    // round 2's `Window.orderBy(...)` was the one real scale-killer).
    //
    // The order key (c_acctbal, c_custkey) is UNIQUE, so rank()==row_number()
    // and all three functions are pure arithmetic on (global rank, n):
    //   pct_rank = (rank-1)/(n-1); cume = rank/n; ntile = bucket-of-rank.
    // Scale.globalRank supplies (rank, n) via range-repartition + local
    // ranks + prefix-summed per-partition counts (bounded: one row per
    // partition). Same answer as the global window, fully distributed.
    "win_ntile_pctrank" -> ((s, d) => {
      graft.operators.Scale.globalRank(
          Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          32, "rank", "n", col("c_acctbal"), col("c_custkey"))
        // ntile(4): first (n%4) buckets get (n DIV 4)+1 rows, rest n DIV 4.
        // ANSI-safe: q>=1 whenever n>=4 (fixture: 1500+ customers).
        .withColumn("q", expr("n DIV 4"))
        .withColumn("rem", expr("n % 4"))
        .withColumn("quartile",
          when(col("rank") <= col("rem") * (col("q") + lit(1L)),
            expr("(rank - 1) DIV (q + 1) + 1"))
          .otherwise(expr("rem + (rank - rem * (q + 1) - 1) DIV q + 1"))
          .cast(IntegerType))
        // n=1 would make (rank-1)/(n-1) = 0/0 = NaN; both engines define
        // percent_rank of a single row as 0 — guard the degenerate case
        .withColumn("pct_rank",
          when(col("n") === 1, lit(0.0)).otherwise(
            r6((col("rank") - lit(1)).cast(DoubleType) /
               (col("n") - lit(1)).cast(DoubleType))))
        .withColumn("cume",
          r6(col("rank").cast(DoubleType) / col("n").cast(DoubleType)))
        .select("c_custkey", "c_acctbal", "quartile", "pct_rank", "cume")
        .orderBy("c_custkey")
    }),

    // Gaps-and-islands (r6e) — the classic streak technique the window
    // battery was missing: per user, distinct active days minus their
    // per-user row_number collapse each CONSECUTIVE run to one constant
    // group key (day - rn is invariant within a run, distinct across
    // runs), so streaks fall out of a plain keyed aggregate. Longest
    // streak per user by min-struct argmax ((len, -start) — earliest
    // start breaks ties), all-integer day arithmetic (epoch-µs DIV —
    // the dq_freshness rule). Both windows and both aggregates key on
    // user_id: one shuffle, any scale.
    "win_streaks" -> ((s, d) => {
      val days = Tables.events(s, d)
        .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val streaks = days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      streaks.groupBy("user_id")
        .agg(max(struct(col("len"), (-col("start_day")).as("ns"))).as("m"),
          count(lit(1)).as("n_streaks"))
        .selectExpr("user_id", "m.len AS max_streak",
          "-m.ns AS streak_start_day", "n_streaks")
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "win_streaks" ->
      // identical island key (day - row_number), identical (len, -start)
      // struct argmax; COUNT comes back BIGINT on both engines
      ("WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events), " +
       "i AS (SELECT user_id, day, day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM d), " +
       "s AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len, MIN(day) AS start_day FROM i GROUP BY 1, 2) " +
       "SELECT user_id, (MAX(struct_pack(len := len, ns := -start_day))).len AS max_streak, " +
       "-(MAX(struct_pack(len := len, ns := -start_day))).ns AS streak_start_day, " +
       "COUNT(*) AS n_streaks FROM s GROUP BY 1 ORDER BY 1"),
    "win_topk_per_group" ->
      ("SELECT c_nationkey, CAST(rnk AS INT) AS rnk, c_custkey, c_name, c_acctbal FROM " +
       "(SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk " +
       "FROM customer) WHERE rnk <= 3 ORDER BY c_nationkey, rnk"),
    "win_lag_lead" ->
      ("SELECT event_id, user_id, " +
       "epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us, " +
       "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type " +
       "FROM events ORDER BY event_id"),
    "win_running_sum" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey " +
       "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_rev " +
       "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"),
    "win_range_frame" ->
      ("SELECT event_id, user_id, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id " +
       "ORDER BY (epoch_us(ts) // 1000000) RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail_sum " +
       "FROM events ORDER BY event_id"),
    "win_first_last" ->
      ("SELECT event_id, user_id, first_value(event_type) OVER w AS first_et, " +
       "last_value(event_type) OVER w AS last_et, nth_value(event_type, 2) OVER w AS second_et " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY event_id"),
    "win_ntile_pctrank" ->
      ("SELECT c_custkey, c_acctbal, CAST(ntile(4) OVER w AS INT) AS quartile, " +
       "((CASE WHEN isnan((percent_rank() OVER w)) OR abs((percent_rank() OVER w)) >= 9e12 THEN CAST((percent_rank() OVER w) AS DOUBLE) ELSE CAST(floor((percent_rank() OVER w) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS pct_rank, ((CASE WHEN isnan((cume_dist() OVER w)) OR abs((cume_dist() OVER w)) >= 9e12 THEN CAST((cume_dist() OVER w) AS DOUBLE) ELSE CAST(floor((cume_dist() OVER w) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS cume " +
       "FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey")
  )
}
