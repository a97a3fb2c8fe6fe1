package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Targeted per-query timing for optimization work (r15): the SAME
  * methodology as `graft.Bench` in REPS mode (noop sink end-to-end,
  * local[$SPARK_GRAFT_CPUS], shuffle.partitions=$SPARK_GRAFT_CPUS, AQE
  * on, median of reps 2..N so cold-codegen rep 1 never pollutes the
  * number) on a NAMED SUBSET, so a single change's before/after can be
  * measured in minutes instead of a full-catalog run.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.TimeQ <reps> q1 q2 ...'
  *
  * Prints one `name: rep1 rep2 ... -> median(2..N)` line per query.
  * Not a driver surface — Bench stays the contract bench. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQ <reps> <query>...")
    val reps = args(0).toInt.max(2)
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("agg_pricing_summary")
      .foreach(f => f(spark, sfDir).write.mode("overwrite").format("noop").save())
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        // drop dead blocks between reps (the Bench session-hygiene rule):
        // each rep constructs a fresh frame, so prior reps' checkpoint
        // blocks are garbage that only adds GC/eviction pressure
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        t
      }
      val warm = ts.drop(1).sorted
      val med =
        if (warm.size % 2 == 1) warm(warm.size / 2)
        else (warm(warm.size / 2 - 1) + warm(warm.size / 2)) / 2.0
      println(f"[timeq] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} -> $med%.3f")
    }
    spark.stop()
  }
}
