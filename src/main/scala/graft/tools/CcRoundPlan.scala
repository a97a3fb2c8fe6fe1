package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Evidence dump for the r16 CC-round rewrite (Scale.connectedComponents):
  * the per-round label-update frame is INTERNAL to the iterative loop, so
  * no declared query's final plan shows it (the materialize-boundary
  * erasure) — this tool dumps the normalized explain of ONE propagation
  * round in both spellings over the real fixture star-edge graph:
  *
  *   plans/r16/cc_round_before.txt — the r15 shape: per-u min aggregate
  *     of edge⋈labels, LEFT-joined back onto labels (two joins, four
  *     exchanges per round);
  *   plans/r16/cc_round_after.txt — the r16 shape: union of self rows
  *     and edge⋈labels contributions into ONE keyed min aggregate (one
  *     join, three exchanges per round).
  *
  * Values are identical by construction (min over {self} ∪ {neighbors});
  * ScaleSpec's chain/clique/random-graph equality pins cover it.
  *
  *   sbt 'runMain graft.tools.CcRoundPlan <outDir>'  (sfDir via env) */
object CcRoundPlan {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(if (args.nonEmpty) args(0) else "plans/r16")
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

    val edges = graft.queries.TextQueries.minhashStarEdges(spark, sfDir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val e = graft.operators.Scale.materialize(
      edges.select(col("src").as("u"), col("dst").as("v"))
        .union(edges.select(col("dst").as("u"), col("src").as("v"))))
    val labels = graft.operators.Scale.materialize(
      Tables.documents(spark, sfDir)
        .select(col("doc_id").as("id"), col("doc_id").as("lbl")))

    // the r15 round spelling (kept here verbatim as the before-evidence)
    val nb = e.join(labels, e("v") === labels("id"))
      .groupBy(col("u")).agg(min(col("lbl")).as("nlbl"))
    val before = labels.join(nb, labels("id") === nb("u"), "left")
      .select(labels("id").as("id"), labels("lbl").as("lbl"),
        least(labels("lbl"), coalesce(nb("nlbl"), labels("lbl"))).as("nxt"))

    // the r16 round spelling (the Scale.connectedComponents body)
    val contrib = e.join(labels, e("v") === labels("id"))
      .select(e("u").as("id"), labels("lbl").as("val"), lit(false).as("self"))
    val after = labels.select(col("id"), col("lbl").as("val"), lit(true).as("self"))
      .union(contrib)
      .groupBy(col("id"))
      .agg(min(when(col("self"), col("val"))).as("lbl"),
        min(col("val")).as("nxt"))
      .where(col("lbl").isNotNull)

    for ((df, name) <- Seq((before, "cc_round_before"), (after, "cc_round_after"))) {
      val txt = Plans.normalize(
        df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt + "\n")
      val nEx = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(txt).size
      val nJoin = "Join".r.findAllIn(txt).size
      println(s"[ccround] $name: exchanges=$nEx joinNodes=$nJoin -> $outDir/$name.txt")
    }
    spark.stop()
  }
}
