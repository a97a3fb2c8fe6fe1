package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Scale
import graft.queries.{SampleQueries, Text2Queries, TextQueries}

/** The B-mandate twin of Migrate.runEventsPipeline: corpus ASSEMBLY, the
  * job an LLM-training-data pipeline runs over a landed document crawl —
  * composed entirely from the declared operators, so every stage's
  * semantics are already oracle-checked in isolation:
  *
  *   near-dup candidate pairs  (TextQueries.minhashPairs — banded LSH,
  *                              equality joins, never all-pairs)
  *     -> components           (Scale.connectedComponents — the dedup unit)
  *     -> one survivor/cluster (best shared-quality score, min-struct
  *                              argmax aggregate)
  *     -> split assignment     (SampleQueries.splitCol — hash-stable
  *                              80/10/10, leakage-safe under rebuilds)
  *
  * Scale posture: pair generation and clustering are the only multi-pass
  * stages (bounded by the LSH bucket joins and graph diameter); survivor
  * selection is one aggregate; split assignment is map-side. The output
  * is the training corpus manifest: survivors only, each with its
  * cluster id, quality score and split. */
object Corpus {

  /** Assemble the dedup'd, split-assigned corpus manifest from the
    * documents table at `sfDir`. One row per SURVIVING doc. */
  def assemble(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = TextQueries.minhashPairs(spark, sfDir)
    val cc = Scale.connectedComponents(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val (_, _, _, _, _, score) = Text2Queries.qualityCols(col("text"))
    val scored = docs.select(col("doc_id"), col("source"), col("lang"),
      score.as("quality"))
    val survivors = cc.join(scored, cc("id") === scored("doc_id"))
      .groupBy(col("cluster"))
      .agg(min(struct((-col("quality")).as("nq"), col("id").as("sid"))).as("m"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster").as("cluster_id"), col("m.sid").as("doc_id"),
        col("cluster_size"))
    survivors.join(scored, "doc_id")
      .withColumn("split", SampleQueries.splitCol(col("doc_id")))
      .select(col("doc_id"), col("source"), col("lang"), col("cluster_id"),
        col("cluster_size"), round(col("quality"), 6).as("quality"), col("split"))
  }
}
