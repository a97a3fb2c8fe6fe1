package graft

import org.apache.spark.sql.functions._

/** Bounds for the approximate operators (SURVEY §5.2.6). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct: pinned deterministic sketch values (±2% sanity)") {
    val exact = SparkEntry.queries("agg_distinct_exact")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("agg_distinct_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    for ((flag, e) <- exact) {
      val a = approx(flag)
      assert(math.abs(a - e).toDouble / e <= 0.02, s"$flag: exact=$e approx=$a")
    }
    // HLL++ is DETERMINISTIC for a fixed dataset + rsd, so the sketch
    // output is pin-able: 199 vs exact 200 per flag (0.5% error) at
    // sf0.001. Any change to the query (column, rsd) or a regression in
    // the sketch path fails HERE, not as a silent accuracy drift.
    // Re-derive these three literals if the fixtures or Spark version bump.
    assert(approx === Map("A" -> 199L, "N" -> 199L, "R" -> 199L),
      s"deterministic HLL golden changed: $approx")
  }

  test("agg_sketch_rollup: merged sketches equal direct sketches, both near exact") {
    val merged = SparkEntry.queries("agg_sketch_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val base = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
    // sketch built DIRECTLY at region grain: HLL registers are per-slot
    // maxima, so merge-of-parts must equal the whole EXACTLY (order- and
    // partition-independence is the property that makes sketch landing +
    // rollup sound)
    val direct = base.groupBy("r_name")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("c_custkey"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = base.groupBy("r_name")
      .agg(countDistinct(col("c_custkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === exact.keySet)
    merged.foreach { case (r, est) =>
      assert(est === direct(r), s"merged != direct for $r")
      assert(math.abs(est - exact(r)).toDouble / exact(r) < 0.05,
        s"$r: est $est vs exact ${exact(r)}")
    }
  }

  test("approx_percentile quartiles honor the rank-error guarantee per type") {
    // approx_percentile(value, ps, 1000) GUARANTEES rank error <= n/1000
    // (GK sketch). Assert the tight form of that contract per event_type:
    // each reported quartile must (a) be an actual data value — GK returns
    // observed values, never interpolates — and (b) lie within the exact
    // value bracket at ranks [floor(p*n) - err - 1, floor(p*n) + err + 1].
    // Tighter and failing-on-regression vs the old spread*0.1 tolerance.
    val byType = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.map(_.getDouble(1)).sorted }
    val approx = SparkEntry.queries("agg_quantiles_approx")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(byType.keySet === approx.keySet)
    for ((t, vals) <- byType; (p, a) <- Seq(0.25, 0.5, 0.75).zip(approx(t))) {
      val n = vals.length
      val err = math.max(1, n / 1000)
      val r = (p * n).toInt
      val lo = vals(math.max(0, r - err - 1))
      val hi = vals(math.min(n - 1, r + err + 1))
      assert(vals.contains(a),
        s"$t p=$p: approx=$a is not an observed data value")
      assert(a >= lo && a <= hi,
        s"$t p=$p: approx=$a outside rank-error bracket [$lo, $hi] (n=$n, err=$err)")
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

  test("text_cms_sweep: w=64 reconciles with text_cms_sketch; hash-free width recompute") {
    // the one-hash-stream proof: the sweep's 64 column must aggregate to
    // exactly the error profile of the standalone sketch query
    val sketch = SparkEntry.queries("text_cms_sketch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = SparkEntry.queries("text_cms_sweep")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.keySet === Set(16L, 64L, 256L))
    assert(rows(64L) === ((sketch.length.toLong,
      sketch.count { case (_, t, e) => e == t }.toLong,
      sketch.map { case (_, t, e) => e - t }.sum,
      sketch.map { case (_, t, e) => e - t }.max)))
    // independent full recompute per width (MessageDigest hash60, no Spark)
    def hash60(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val vocab = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    Seq(16L, 64L, 256L).foreach { w =>
      val cells = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
      toks.foreach { t =>
        (0 until 4).foreach(r => cells((r, hash60(s"cms$r:" + t) % w)) += 1L)
      }
      val errs = vocab.map { case (t, n) =>
        (0 until 4).map(r => cells((r, hash60(s"cms$r:" + t) % w))).min - n
      }
      assert(rows(w) === ((vocab.size.toLong, errs.count(_ == 0L).toLong,
        errs.sum, errs.max)), s"width $w profile")
      errs.foreach(e => assert(e >= 0L, s"width $w must never undercount"))
    }
  }
}
