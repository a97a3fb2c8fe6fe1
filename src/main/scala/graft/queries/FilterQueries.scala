package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import Qutil._

/** SURVEY §2.2 — projection, filter, predicates (field cleansing / DQ
  * handling of a Salesforce migration, /root/reference/README.md:3). */
object FilterQueries {

  val queries: Map[String, Q] = Map(
    // Range + IN + LIKE + BETWEEN compound predicate, plus a derived
    // DECIMAL column. All predicates push down to the parquet scan.
    "filter_range_like_in" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01") &&
               col("l_shipdate") <  lit("1997-01-01") &&
               col("l_returnflag").isin("A", "R") &&
               col("l_linestatus").like("F%") &&
               col("l_discount").between(0.02, 0.08))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"),
          emitD(moneyD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "l_shipdate",
          "l_returnflag", "l_linestatus")),

    // Null semantics: nullif/coalesce/null-safe-equal. NULLs synthesized
    // from l_tax=0 since fixtures carry no native NULLs.
    "filter_null_safe" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where((col("l_tax") <=> lit(0.0)) || col("l_tax") > 0.07)
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(nullif(col("l_tax"), lit(0.0)), lit(-1.0)).as("tax_nz"))
        .orderBy("l_orderkey", "l_linenumber", "tax_nz")),

    // Tiered CASE WHEN classification with counts per bucket.
    "project_case_when" -> ((s, d) =>
      Tables.orders(s, d)
        .select(when(col("o_totalprice") < 50000.0, "small")
          .when(col("o_totalprice") < 150000.0, "mid")
          .otherwise("large").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket"))
  )

  val oracle: Map[String, String] = Map(
    "filter_range_like_in" ->
      ("SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_shipdate, " +
       "CAST(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS DECIMAL(18,0))*CAST(0.01 AS DECIMAL(3,2)) AS DOUBLE) AS revenue " +
       "FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
       "AND l_returnflag IN ('A','R') AND l_linestatus LIKE 'F%' " +
       "AND l_discount BETWEEN 0.02 AND 0.08 " +
       "ORDER BY l_orderkey, l_linenumber, revenue, l_shipdate, l_returnflag, l_linestatus"),
    "filter_null_safe" ->
      ("SELECT l_orderkey, l_linenumber, COALESCE(NULLIF(l_tax, 0.0), -1.0) AS tax_nz " +
       "FROM lineitem WHERE (l_tax IS NOT DISTINCT FROM 0.0) OR l_tax > 0.07 " +
       "ORDER BY l_orderkey, l_linenumber, tax_nz"),
    "project_case_when" ->
      ("SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small' " +
       "WHEN o_totalprice < 150000.0 THEN 'mid' ELSE 'large' END AS bucket, " +
       "COUNT(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1")
  )
}
