package graft

import org.apache.spark.sql.functions._

// top-level: Spark encoders cannot capture test-class inner scopes
case class Cust(c_custkey: Long, c_name: String, c_nationkey: Int,
  c_acctbal: Double, c_mktsegment: String)
case class Ord(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
  o_totalprice: Double)

/** Typed Dataset surface (SURVEY §1.3): case-class Encoders, joinWith,
  * groupByKey/mapGroups — asserted equal to the untyped plans. */
class TypedSpec extends SparkSpec {
  import spark.implicits._

  private def custDs = Tables.customer(spark, sf).as[Cust]
  private def ordDs = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice").as[Ord]

  test("joinWith preserves both typed sides") {
    val c = custDs
    val o = ordDs
    val joined: Array[(Cust, Ord)] = c
      .joinWith(o, c("c_custkey") === o("o_custkey"), "inner")
      .collect()
    assert(joined.nonEmpty)
    joined.take(100).foreach { case (c, o) => assert(c.c_custkey === o.o_custkey) }
    val untyped = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey")).count()
    assert(joined.length.toLong === untyped)
  }

  test("groupByKey + mapGroups equals the untyped aggregation") {
    val typed = ordDs.groupByKey(_.o_custkey)
      .mapGroups { (k, it) =>
        val xs = it.toSeq
        (k, xs.length.toLong, xs.map(o => math.floor(o.o_totalprice * 100 + 0.5).toLong).sum)
      }
      .collect().map { case (k, n, cents) => (k, n, cents) }.toSet
    val untyped = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(typed === untyped)
  }

  test("reduceGroups folds to the same maxima as the untyped max") {
    val typed = ordDs.groupByKey(_.o_custkey)
      .reduceGroups((a, b) => if (a.o_totalprice >= b.o_totalprice) a else b)
      .map { case (k, o) => (k, o.o_totalprice) }
      .collect().toMap
    val untyped = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(max("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(typed === untyped)
  }
}
