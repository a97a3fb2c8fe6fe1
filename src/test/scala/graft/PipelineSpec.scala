package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.Migrate

/** End-to-end migration pipeline over a deliberately-dirtied stringly
  * staging extract (the reference's actual job shape). */
class PipelineSpec extends SparkSpec {

  private def staging = {
    // stringly extract: every column VARCHAR, plus injected dirty rows
    val base = Tables.events(spark, sf)
      .select(col("event_id").cast("string"), col("ts").cast("string"),
        col("user_id").cast("string"), col("event_type").cast("string"),
        col("value").cast("string"))
    val dirty = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("not_a_number", "2024-01-05 10:00:00", "1", "click", "1.5"),
        org.apache.spark.sql.Row("999001", "2024-01-05 10:00:00", "1", "NOT_A_TYPE", "1.5")),
      StructType(Seq("event_id", "ts", "user_id", "event_type", "value")
        .map(n => StructField(n, StringType))))
    base.unionByName(dirty)
  }

  test("conform casts stringly columns; bad values become NULL (try_cast)") {
    val typed = Migrate.conform(staging, StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType))))
    assert(typed.schema("event_id").dataType === LongType)
    assert(typed.where(col("event_id").isNull).count() === 1)
  }

  test("full pipeline: DQ quarantines dirty rows, dedup compacts, SCD2 chains validity") {
    val out = java.nio.file.Files.createTempDirectory("graft_migrate").toString
    val (landed, report) = Migrate.runEventsPipeline(spark, staging, out)

    val rep = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("null_key") === 1L, "the non-castable event_id row")
    assert(rep("bad_type") === 1L, "the unknown event_type row")

    // last-write-wins: one open (valid_to IS NULL) row per (user, type)
    val open = landed.where(col("valid_to").isNull)
    assert(open.groupBy("user_id", "event_type").count()
      .where(col("count") > 1).count() === 0)

    // partition layout exists (land_date directories)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("land_date="))
    assert(dirs.nonEmpty)

    // validity chains: valid_from < valid_to wherever closed
    assert(landed.where(col("valid_to").isNotNull &&
      col("valid_from") >= col("valid_to")).count() === 0)
  }
}
