package graft

import org.apache.spark.sql.functions._

/** graph_pagerank invariants: the distributed integer PageRank must agree
  * EXACTLY with a single-threaded reference run of the same integer
  * recurrence (micro-unit ranks, r DIV deg contributions, 17/20 damping)
  * — integer arithmetic leaves no tolerance to hide behind. */
class GraphSpec extends SparkSpec {

  test("graph_pagerank equals an in-memory integer reference (sf0.001)") {
    // reference graph, built the same way: supplier=2k / customer=2k+1
    val e0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => contrib(v) += rank(u) / deg(u) }
      rank = contrib.map { case (v, s) => v -> (150000L + 17L * s / 20L) }.toMap
    }
    val expTop = rank.toSeq.sortBy { case (id, r) => (-r, id) }.take(20)
    val got = SparkEntry.queries("graph_pagerank")(spark, sf)
      .select("node", "pr").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === expTop, "distributed ranks diverge from the reference")
    // structural sanity: both entity kinds rank, and floors hold
    val kinds = SparkEntry.queries("graph_pagerank")(spark, sf)
      .select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(rank.values.forall(_ >= 150000L), "damping floor violated")
    assert(kinds.nonEmpty && kinds.subsetOf(Set("supplier", "customer")))
  }
}
