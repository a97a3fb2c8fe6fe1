package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level decomposition timings for the optimization rounds: times
  * the SHARED internal frames (minhash signatures, buckets, pair
  * generators, star edges, CC, embedding band machinery) with the same
  * noop-sink methodology as Bench/TimeQ, so "where do the seconds of a
  * 5 s dedup query actually go" is a measurement instead of a guess
  * (guide §1: measure first). Not a driver surface.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.ProfileQ <reps> [stage ...]'
  *
  * With no stage args, runs every registered stage. Prints
  * `[profile] name: rep1 rep2 ... -> median(2..N)` per stage. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQ <reps> [stage ...]")
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

    import graft.queries.{TextQueries, SimQueries}
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "docs_scan" -> (() => Tables.documents(spark, sfDir)),
      "minhash_sigs" -> (() => TextQueries.minhashSigs(Tables.documents(spark, sfDir))),
      "minhash_buckets" -> (() => TextQueries.minhashBuckets(Tables.documents(spark, sfDir))),
      "minhash_pairs" -> (() => TextQueries.minhashPairs(spark, sfDir)),
      "minhash_star_edges" -> (() => TextQueries.minhashStarEdges(spark, sfDir)),
      "cc_over_star" -> (() => {
        import org.apache.spark.sql.functions.col
        graft.operators.Scale.connectedComponents(
          Tables.documents(spark, sfDir).select(col("doc_id").as("id")),
          TextQueries.minhashStarEdges(spark, sfDir)
            .select(col("doc_a").as("src"), col("doc_b").as("dst")))
      }),
      "embed_band_pairs" -> (() => SimQueries.embedBandPairs(spark, sfDir))
    )
    val run = if (names.isEmpty) stages else stages.filter(s => names.contains(s._1))
    run.foreach { case (name, mk) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        t
      }
      val warm = ts.drop(1).sorted
      val med =
        if (warm.size % 2 == 1) warm(warm.size / 2)
        else (warm(warm.size / 2 - 1) + warm(warm.size / 2)) / 2.0
      println(f"[profile] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} -> $med%.3f")
    }
    spark.stop()
  }
}
