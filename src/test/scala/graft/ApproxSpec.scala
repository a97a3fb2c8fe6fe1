package graft

import org.apache.spark.sql.functions._

/** Bounds for the approximate operators (SURVEY §5.2.6). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within ±2% of exact per returnflag") {
    val exact = SparkEntry.queries("agg_distinct_exact")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("agg_distinct_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    for ((flag, e) <- exact) {
      val a = approx(flag)
      assert(math.abs(a - e).toDouble / e <= 0.02, s"$flag: exact=$e approx=$a")
    }
  }

  test("approx_percentile quartiles bracket the exact percentile per type") {
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.25, 0.5, 0.75))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = SparkEntry.queries("agg_quantiles_approx")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exact.keySet === approx.keySet)
    for ((t, e) <- exact; (a, x) <- approx(t).zip(e)) {
      val spread = e.last - e.head
      assert(math.abs(a - x) <= math.max(spread * 0.1, 1.0),
        s"$t: approx=$a exact=$x (quartile spread $spread)")
    }
  }

  test("minhash LSH candidates recall >= 0.9 of true Jaccard>=0.8 pairs") {
    // True high-similarity pairs from the exact operator (threshold 0.6,
    // re-filter at 0.8); LSH candidate set must cover >= 90% of them.
    val truth = SparkEntry.queries("text_near_dup_jaccard")(spark, sf)
      .where(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("text_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (truth.nonEmpty) {
      val recall = truth.count(cand.contains).toDouble / truth.size
      assert(recall >= 0.9, s"recall=$recall over ${truth.size} true pairs")
    } else {
      // No >=0.8 pairs at this sf — assert the pipeline still produces a
      // well-formed (possibly empty) candidate set.
      assert(cand.forall { case (a, b) => a < b })
    }
  }
}
