package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas documented in /root/repo/FIXTURES.md).
  *
  * The reference system lands Salesforce objects as columnar files on S3
  * (/root/reference/README.md:3,6,7); here each object is a parquet file
  * under the scale-factor directory passed to every query.
  */
object Tables {
  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = t(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")

  /** `events.ts` has shipped as parquet timestamp[ns] (rounds 1-6e) and as
    * timestamp[us] (the round-6f fixture regeneration) — handle BOTH by
    * inspecting the read schema:
    *  - ns: Spark's vectorized reader rejects it ([PARQUET_TYPE_ILLEGAL]);
    *    read raw nanos via the nanosAsLong conf and truncate to µs with
    *    integer arithmetic (DIV — double math would lose precision at
    *    1.7e18 ns). DuckDB's ns→µs cast truncates identically.
    *  - µs (isAdjustedToUTC=false): Spark 4 infers TIMESTAMP_NTZ; cast to
    *    the session TimestampType (UTC session ⇒ the same instants, and
    *    unix_micros()/date_trunc() keep working unchanged).
    * Both paths land the identical µs instants the oracles see. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** SQL entry point (SURVEY §3.2 EP2): register every fixture table as a
    * temp view so the whole catalog is queryable via spark.sql. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events,
      "documents" -> documents, "embeddings" -> embeddings)
    names.foreach(n => loaders(n)(spark, sfDir).createOrReplaceTempView(n))
  }
}
