package graft

import org.apache.spark.sql.functions._

/** The SQL entry point (SURVEY §3.2 EP2) beyond the one declared
  * GROUPING SETS query: registered views, parameterized SQL, and Spark 4
  * VARIANT handling of the semi-structured props column. */
class SqlSurfaceSpec extends SparkSpec {

  test("registerAll exposes every fixture table to spark.sql") {
    Tables.registerAll(spark, sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() === 1L, n)
    }
    // a real join through the SQL surface
    val r = spark.sql(
      """SELECT r_name, COUNT(*) AS n FROM region JOIN nation
        |ON r_regionkey = n_regionkey GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(r.count() === 5)
  }

  test("parameterized SQL (named markers) binds literals safely") {
    Tables.registerAll(spark, sf)
    val df = spark.sql(
      "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice < :cap",
      Map("cap" -> 50000.0))
    val n = df.head.getLong(0)
    val expected = Tables.orders(spark, sf).where(col("o_totalprice") < 50000.0).count()
    assert(n === expected)
  }

  test("VARIANT: parse_json on props, typed extraction agrees with from_json") {
    Tables.registerAll(spark, sf)
    val v = spark.sql(
      """SELECT event_id, variant_get(parse_json(props), '$.k', 'int') AS k
        |FROM events ORDER BY event_id""".stripMargin)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getInt(1)))
    val j = SparkEntry.queries("source_json_infer")(spark, sf)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getInt(1)))
    assert(v.sameElements(j))
  }
}
