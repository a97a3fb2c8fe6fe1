package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qutil._

/** SURVEY §2.10 — migration/CDC & data-quality operators: the reference's
  * actual job ("migrate the ATLAS objects", /root/reference/README.md:3).
  * Snapshot diff, SCD-2 ranges, DQ rule counts, reconciliation row-hash,
  * and the per-user pivot report. */
object CdcQueries {

  val queries: Map[String, Q] = Map(
    // Core of object-migration sync: full-outer join of previous vs current
    // snapshot, classify I/U/D by null pattern. "current" simulates deletes
    // (key % 97 dropped) and updates (key % 13 repriced).
    "cdc_snapshot_diff" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      val prev = ord.where(col("o_orderdate") < lit("2000-01-01"))
        .select(col("o_orderkey").as("key"), dec2(col("o_totalprice")).as("p_price"))
      val curr = ord.where(col("o_orderdate") < lit("2000-07-01") &&
          !(col("o_orderkey") % 97 === 0))
        .select(col("o_orderkey").as("key"),
          moneyD(when(col("o_orderkey") % 13 === 0, col("o_totalprice") * 1.05)
            .otherwise(col("o_totalprice"))).as("c_price"))
      prev.join(curr, Seq("key"), "full_outer")
        .withColumn("op",
          when(col("p_price").isNull, "I")
            .when(col("c_price").isNull, "D")
            .when(col("p_price") =!= col("c_price"), "U"))
        .where(col("op").isNotNull)
        // classification compares exact decimals; only the EMISSION is double
        .select(col("op"), col("key"),
          emitD(col("p_price")).as("p_price"), emitD(col("c_price")).as("c_price"))
        .orderBy("key")
    }),

    // SCD-2 effective ranges per (user, type): valid_from=ts, valid_to=lead.
    "scd2_windows" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "event_type", "valid_from", "event_id")
    }),

    // DQ rule table: one row per rule with its violation count. Unions of
    // filtered counts + a dup-PK group check + an FK anti-join — the
    // migration-validation pass that runs after every load.
    "dq_checks" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      def one(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("violations")).select(lit(name).as("rule"), col("violations"))
      // The three row-predicate rules share ONE scan via conditional
      // aggregation (at 100 TB, one pass vs three is the whole game);
      // dup_pk (re-aggregation) and fk_orphan (anti-join) are inherently
      // separate shapes.
      def cnt(pred: org.apache.spark.sql.Column) = sum(when(pred, 1L).otherwise(0L))
      val rowRules = li.agg(
        cnt(col("l_discount") < 0.0 || col("l_discount") > 1.0).as("disc_range"),
        cnt(col("l_extendedprice") < 0.0).as("neg_price"),
        cnt(col("l_orderkey").isNull).as("null_key"))
      val rowRulesLong = rowRules.selectExpr(
        "stack(3, 'disc_range', disc_range, 'neg_price', neg_price, 'null_key', null_key) AS (rule, violations)")
      rowRulesLong
        .union(one("dup_pk", li.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("c")).where(col("c") > 1)))
        .union(one("fk_orphan", li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")))
        .orderBy("rule")
    }),

    // Per-row content fingerprint for source/target reconciliation hashing.
    "dq_row_hash" -> ((s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"),
          sha2(concat_ws("|", col("n_nationkey").cast("string"), col("n_name"),
            col("n_regionkey").cast("string")), 256).as("row_hash"))
        .orderBy("n_nationkey")),

    // Pivot: per user, event-type counts as columns (explicit value list —
    // inferred pivot values are nondeterministic and cost an extra pass).
    "pivot_event_matrix" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // Unpivot (melt): the wide matrix back to long form — keeps the
    // zero-count cells the direct GROUP BY would lose.
    "unpivot_event_matrix" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("user_id")),
          Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
          "event_type", "cnt")
        .orderBy("user_id", "event_type"))
  )

  val oracle: Map[String, String] = Map(
    "cdc_snapshot_diff" ->
      ("WITH prev AS (SELECT o_orderkey AS key, CAST(o_totalprice AS DECIMAL(18,2)) AS p_price " +
       "FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'), " +
       "curr AS (SELECT o_orderkey AS key, CAST(CAST(FLOOR((CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice*1.05 " +
       "ELSE o_totalprice END)*100 + 0.5) AS DECIMAL(18,0))*CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2)) AS c_price FROM orders " +
       "WHERE o_orderdate < TIMESTAMP '2000-07-01' AND NOT (o_orderkey % 97 = 0)), " +
       "diff AS (SELECT COALESCE(p.key, c.key) AS key, p_price, c_price, " +
       "CASE WHEN p.key IS NULL THEN 'I' WHEN c.key IS NULL THEN 'D' " +
       "WHEN p_price <> c_price THEN 'U' END AS op " +
       "FROM prev p FULL OUTER JOIN curr c ON p.key = c.key) " +
       "SELECT op, key, CAST(p_price AS DOUBLE) AS p_price, CAST(c_price AS DOUBLE) AS c_price " +
       "FROM diff WHERE op IS NOT NULL ORDER BY key"),
    "scd2_windows" ->
      ("SELECT user_id, event_type, event_id, ts AS valid_from, " +
       "lead(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS valid_to " +
       "FROM events ORDER BY user_id, event_type, valid_from, event_id"),
    "dq_checks" ->
      ("SELECT 'disc_range' AS rule, COUNT(*) AS violations FROM lineitem WHERE l_discount < 0.0 OR l_discount > 1.0 " +
       "UNION ALL SELECT 'dup_pk', COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem " +
       "GROUP BY 1,2 HAVING COUNT(*) > 1) " +
       "UNION ALL SELECT 'fk_orphan', COUNT(*) FROM lineitem WHERE NOT EXISTS " +
       "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey) " +
       "UNION ALL SELECT 'neg_price', COUNT(*) FROM lineitem WHERE l_extendedprice < 0.0 " +
       "UNION ALL SELECT 'null_key', COUNT(*) FROM lineitem WHERE l_orderkey IS NULL " +
       "ORDER BY rule"),
    "dq_row_hash" ->
      ("SELECT n_nationkey, sha256(concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name, " +
       "CAST(n_regionkey AS VARCHAR))) AS row_hash FROM nation ORDER BY n_nationkey"),
    "pivot_event_matrix" ->
      ("SELECT user_id, COUNT(*) FILTER (WHERE event_type = 'click') AS click, " +
       "COUNT(*) FILTER (WHERE event_type = 'error') AS error, " +
       "COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
       "COUNT(*) FILTER (WHERE event_type = 'signup') AS signup, " +
       "COUNT(*) FILTER (WHERE event_type = 'view') AS view " +
       "FROM events GROUP BY 1 ORDER BY 1"),
    "unpivot_event_matrix" ->
      ("SELECT user_id, event_type, cnt FROM (" +
       "SELECT user_id, COUNT(*) FILTER (WHERE event_type = 'click') AS click, " +
       "COUNT(*) FILTER (WHERE event_type = 'error') AS error, " +
       "COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
       "COUNT(*) FILTER (WHERE event_type = 'signup') AS signup, " +
       "COUNT(*) FILTER (WHERE event_type = 'view') AS view " +
       "FROM events GROUP BY 1" +
       ") UNPIVOT (cnt FOR event_type IN (click, error, purchase, signup, view)) " +
       "ORDER BY user_id, event_type")
  )
}
