package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Custom DSv2 source + injected optimizer rule + extensions wiring. */
class Dsv2Spec extends SparkSpec {

  private def synth(n: Long, parts: Int) =
    spark.read.format("graft.sources.SyntheticEventsSource")
      .option("rows", n.toString).option("partitions", parts.toString).load()

  test("synthetic DSv2 source generates deterministic rows across partitionings") {
    val a = synth(10000, 4)
    assert(a.count() === 10000L)
    assert(a.schema.fieldNames.toSeq === Seq("event_id", "user_id", "event_type", "value"))
    assert(a.rdd.getNumPartitions === 4)
    val b = synth(10000, 7)
    val ha = a.orderBy("event_id").collect().map(_.toString).toSeq
    val hb = b.orderBy("event_id").collect().map(_.toString).toSeq
    assert(ha === hb, "content must not depend on partitioning")
    // engine ops compose on top of the custom source
    val agg = a.groupBy("event_type").agg(count(lit(1)).as("n"))
    assert(agg.count() === 5)
  }

  test("CollapseNestedUpper rule rewrites upper(upper(x)) in the optimized plan") {
    // runtime hook for the same rule GraftExtensions injects at session
    // creation (a shared test session can't re-apply spark.sql.extensions)
    spark.experimental.extraOptimizations = Seq(graft.plans.CollapseNestedUpper)
    try {
      val df = Tables.documents(spark, sf)
        .selectExpr("doc_id", "upper(upper(lang)) AS u", "lower(lower(source)) AS l")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("upper(upper"), s"rule must collapse:\n$optimized")
      assert(!optimized.contains("lower(lower"), s"rule must collapse:\n$optimized")
      assert(df.where(col("u") =!= upper(col("lang"))).count() === 0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("GraftExtensions wires the function and the rule without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
  }
}
