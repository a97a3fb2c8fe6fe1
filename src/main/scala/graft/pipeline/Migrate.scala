package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's actual job, end-to-end: "migrate the ATLAS objects from
  * traditional system (Salesforce) to Cloud (AWS) using PySpark"
  * (/root/reference/README.md:3,6,7,9) — re-expressed as composable
  * DataFrame stages:
  *
  *   staged stringly extract
  *     -> conform (cast to the target schema, track cast failures)
  *     -> DQ gate (rule table; violating rows quarantined, not dropped
  *        silently)
  *     -> dedupLatest (CDC last-write-wins per business key)
  *     -> scd2Merge (append to typed history with valid_from/valid_to)
  *     -> land (partitioned columnar write — the S3 layout)
  *
  * Every stage is DataFrame => DataFrame, so the same pipeline body runs
  * per Airflow tick over an incremental extract, or as one backfill.
  * Scale: the only shuffles are the dedup/SCD2 window over the business
  * key and the final partitioned write; conform and DQ are map-only. */
object Migrate {

  /** Cast a stringly staging frame to the target schema. Non-castable
    * values become NULL (caught by the DQ gate, mirroring a Salesforce
    * export's dirty rows) rather than failing the job. */
  def conform(raw: DataFrame, target: StructType): DataFrame =
    raw.select(target.fields.map(f =>
      // try_cast, not cast: ANSI mode would abort the whole load on one
      // malformed export row
      expr(s"try_cast(${f.name} AS ${f.dataType.sql})").as(f.name)): _*)

  /** Apply DQ rules; returns (clean rows, quarantined rows tagged with the
    * first failing rule, per-rule violation counts). */
  def dqGate(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame, DataFrame) = {
    // NULL predicate = FAIL: a rule that cannot evaluate (NULL input to
    // isin, comparison on NULL, …) must quarantine the row, not pass it.
    val firstFail = rules.foldLeft(lit(null).cast(StringType)) {
      case (acc, (name, pred)) => coalesce(acc, when(!coalesce(pred, lit(false)), name))
    }
    val tagged = df.withColumn("__fail", firstFail)
    val clean = tagged.where(col("__fail").isNull).drop("__fail")
    val quarantined = tagged.where(col("__fail").isNotNull)
    val report = quarantined.groupBy(col("__fail").as("rule"))
      .agg(count(lit(1)).as("violations"))
    (clean, quarantined, report)
  }

  /** CDC last-write-wins compaction per business key (ts desc, then a
    * deterministic tiebreak column). */
  def dedupLatest(df: DataFrame, keys: Seq[String], ts: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).desc, col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** SCD-2: merge an incoming batch into history, recomputing
    * valid_from/valid_to per key; open rows have valid_to NULL. */
  def scd2Merge(history: DataFrame, incoming: DataFrame,
      keys: Seq[String], ts: String): DataFrame = {
    val all = history.drop("valid_from", "valid_to")
      .unionByName(incoming)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    all.withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
  }

  /** Partitioned columnar land — the S3 layout (README.md:7): partition
    * dirs prune every downstream incremental read. */
  def land(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Upsert merge (MERGE INTO semantics on plain parquet): incoming rows
    * win on key collision, unmatched target rows survive, brand-new keys
    * insert. One full-outer join on the business key — the per-tick
    * object-sync step of the migration. */
  def upsertMerge(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = target.columns.filterNot(keys.contains)
    val t = target.select(keys.map(col) ++ dataCols.map(c => col(c).as(s"__t_$c")): _*)
    val i = incoming.select(
      keys.map(col) ++ (dataCols.map(c => col(c).as(s"__i_$c")) :+
        lit(true).as("__i_present")): _*)
    // row-presence flag, NOT per-column coalesce: an incoming row that
    // legitimately nulls a field must not resurrect the target's old value
    t.join(i, keys, "full_outer")
      .select(keys.map(col) ++ dataCols.map(c =>
        when(col("__i_present").isNotNull, col(s"__i_$c"))
          .otherwise(col(s"__t_$c")).as(c)): _*)
  }

  /** Whole pipeline over a stringly staging extract of `events` (the
    * incremental CDC feed stand-in): returns the landed history plus the
    * DQ report for the run. */
  def runEventsPipeline(spark: SparkSession, staging: DataFrame, outPath: String)
      : (DataFrame, DataFrame) = {
    val target = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val typed = conform(staging, target)
    val (clean, _, report) = dqGate(typed, Seq(
      "null_key" -> col("event_id").isNotNull,
      "null_ts" -> col("ts").isNotNull,
      "bad_type" -> col("event_type").isin("click", "error", "purchase", "signup", "view")))
    val deduped = dedupLatest(clean, Seq("user_id", "event_type"), "ts", "event_id")
    val history = scd2Merge(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(target.fields :+ StructField("valid_from", TimestampType)
          :+ StructField("valid_to", TimestampType))),
      deduped, Seq("user_id", "event_type"), "ts")
    land(history.withColumn("land_date", to_date(col("ts"))), outPath, "land_date")
    (spark.read.parquet(outPath), report)
  }
}
