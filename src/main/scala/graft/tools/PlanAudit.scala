package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Catalog-wide physical-plan audit (r15 optimization round): one row per
  * declared query with the plan-shape counters the optimization guide
  * says to look for (§2 Exchange count, §3 join strategies / cartesian
  * products, §6 scan pushdown, §4 interpreted-HOF density, partitionless
  * windows/SinglePartition exchanges). This is how "examine every
  * operator" scales to 295 queries: the audit surfaces the outliers,
  * the outliers get read by hand.
  *
  *   sbt 'runMain graft.tools.PlanAudit /tmp/plan_audit.tsv'
  *
  * Columns: query, exchanges, bhj, smj, shj, bnlj, cartesian,
  * single_partition, window, generate, hof_sites (aggregate/transform/
  * zip_with occurrences in the plan text — interpreted CodegenFallback
  * density), scans, scans_with_filter. Uses the EXECUTED (pre-AQE-final)
  * plan string of the analyzed frame — the same surface PlanGuardSpec
  * greps. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/plan_audit.tsv")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("query\texchanges\tbhj\tsmj\tshj\tbnlj\tcartesian\tsingle_part" +
      "\twindow\tgenerate\thof_sites\tscans\tscans_with_filter\terror\n")
    def cnt(s: String, pat: String): Int = pat.r.findAllMatchIn(s).length
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        val row = Seq(
          cnt(p, "Exchange "),
          cnt(p, "BroadcastHashJoin"),
          cnt(p, "SortMergeJoin"),
          cnt(p, "ShuffledHashJoin"),
          cnt(p, "BroadcastNestedLoopJoin"),
          cnt(p, "CartesianProduct"),
          cnt(p, "SinglePartition"),
          cnt(p, "Window"),
          cnt(p, "Generate"),
          cnt(p, "aggregate\\(") + cnt(p, "transform\\(") + cnt(p, "zip_with\\("),
          cnt(p, "FileScan parquet"),
          cnt(p, "PushedFilters: \\[[^\\]]")
        ).mkString("\t")
        sb.append(s"$name\t$row\t\n")
      } catch {
        case scala.util.control.NonFatal(e) =>
          sb.append(s"$name\t\t\t\t\t\t\t\t\t\t\t\t\t${e.getClass.getSimpleName}\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[planaudit] wrote $out")
    spark.stop()
  }
}
