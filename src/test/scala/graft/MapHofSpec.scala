package graft

import org.apache.spark.sql.functions._

/** Map higher-order functions — completes the HOF family coverage
  * (array HOFs are exercised by fn_array/text ops; these cover the
  * MapType side, test-only since DuckDB's map-lambda parity is partial). */
class MapHofSpec extends SparkSpec {
  import spark.implicits._

  private def m = Seq(
    (1L, Map("a" -> 1, "b" -> 2, "c" -> 3)),
    (2L, Map("x" -> 10, "y" -> 0))
  ).toDF("id", "m")

  test("transform_keys / transform_values") {
    val r = m.select(col("id"),
        map_values(transform_values(col("m"), (_, v) => v * 10)).as("v10"),
        map_keys(transform_keys(col("m"), (k, _) => upper(k))).as("ku"))
      .orderBy("id").collect()
    assert(r(0).getSeq[Int](1).sorted === Seq(10, 20, 30))
    assert(r(0).getSeq[String](2).sorted === Seq("A", "B", "C"))
  }

  test("map_filter and map_zip_with") {
    val r = m.select(col("id"),
        map_keys(map_filter(col("m"), (_, v) => v > 1)).as("big"),
        map_zip_with(col("m"), col("m"), (_, v1, v2) => v1 + v2).as("doubled"))
      .orderBy("id").collect()
    assert(r(0).getSeq[String](1).sorted === Seq("b", "c"))
    val doubled = r(1).getMap[String, Int](2)
    assert(doubled("x") === 20 && doubled("y") === 0)
  }

  test("map from parsed JSON round-trips through map_concat/element_at") {
    val ev = Tables.events(spark, sf).limit(50)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(element_at(map_concat(col("m"), map(lit("extra"), lit(7))), "extra").as("e"),
        element_at(col("m"), "k").as("k"))
      .collect()
    assert(ev.forall(_.getInt(0) === 7))
    assert(ev.forall(!_.isNullAt(1)))
  }
}
