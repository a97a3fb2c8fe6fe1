package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Qutil._

/** SURVEY §2.6 sorts/limits/top-k + §2.7 set operations.
  *
  * Top-k goes through TakeOrderedAndProject (per-partition heap + driver
  * merge of k rows), never a full global sort — the only top-k that works
  * at 100 TB. */
object SortSetQueries {

  val queries: Map[String, Q] = Map(
    // Multi-key global sort, first 100 (TakeOrderedAndProjectExec).
    "sort_multi_key" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_orderdate").desc, col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy(col("o_orderdate").desc, col("o_totalprice").desc, col("o_orderkey"))),

    // Global top-20 by price without a full sort.
    "topk_global" -> ((s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))),

    // UNION ALL multiplicities of (nationkey, balance-bucket) pairs across
    // customer and supplier (group-count makes the all/distinct duality
    // observable in one result).
    "set_union" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast(IntegerType).as("bal_bucket"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"),
        floor(col("s_acctbal") / lit(1000.0)).cast(IntegerType).as("bal_bucket"))
      c.union(su)
        .groupBy("nationkey", "bal_bucket")
        .agg(count(lit(1)).as("cnt_all"))
        .orderBy("nationkey", "bal_bucket")
    }),

    // Nation keys present in both customer and supplier (distinct).
    "set_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // Nation keys with customers but no suppliers — reconciliation diff.
    "set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey"))
  )

  val oracle: Map[String, String] = Map(
    "sort_multi_key" ->
      ("SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders " +
       "ORDER BY o_orderdate DESC, o_totalprice DESC, o_orderkey LIMIT 100"),
    "topk_global" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
       "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"),
    "set_union" ->
      ("SELECT nationkey, bal_bucket, COUNT(*) AS cnt_all FROM (" +
       "SELECT c_nationkey AS nationkey, CAST(FLOOR(c_acctbal/1000.0) AS INT) AS bal_bucket FROM customer " +
       "UNION ALL " +
       "SELECT s_nationkey, CAST(FLOOR(s_acctbal/1000.0) AS INT) FROM supplier" +
       ") GROUP BY 1,2 ORDER BY 1,2"),
    "set_intersect" ->
      ("SELECT c_nationkey AS nationkey FROM customer INTERSECT " +
       "SELECT s_nationkey FROM supplier ORDER BY nationkey"),
    "set_except" ->
      ("SELECT c_nationkey AS nationkey FROM customer EXCEPT " +
       "SELECT s_nationkey FROM supplier ORDER BY nationkey")
  )
}
