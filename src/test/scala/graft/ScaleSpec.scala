package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Scale operators: semantic equivalence + the plan properties they exist
  * for (skew spread, shuffle elimination). */
class ScaleSpec extends SparkSpec {

  test("saltedJoin is semantically identical to a plain inner join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, "l_orderkey")
    val salted = Scale.saltedJoin(li, ord, "l_orderkey", saltFactor = 4)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("l_orderkey").count()
    val b = salted.groupBy("l_orderkey").count()
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("bucketedJoin plans without a shuffle on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
      val (joined, _, _) = Scale.bucketedJoin(spark, ord, li, "o_orderkey", 4, "graft_bkt")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val expected = ord.join(li, "o_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("sortedRepartition yields range-disjoint sorted partitions") {
    val df = Scale.sortedRepartition(
      Tables.orders(spark, sf).select("o_orderkey"), 4, col("o_orderkey"))
    val perPart = df.select(col("o_orderkey"),
        spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .orderBy("lo").collect()
    assert(perPart.length <= 4)
    perPart.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1), "ranges must not overlap")
      case _ =>
    }
  }
}
