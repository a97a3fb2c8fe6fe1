package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema sanity over fixtures (esp. ns-timestamp events). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val loaders: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> Tables.region, "nation" -> Tables.nation, "customer" -> Tables.customer,
      "supplier" -> Tables.supplier, "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    for ((n, load) <- loaders) {
      val df = load(spark, dir)
      println(s"=== $n (${df.count()} rows)")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
