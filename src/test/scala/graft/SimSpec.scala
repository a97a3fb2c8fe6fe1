package graft

import org.apache.spark.sql.functions._

/** Tests for the oracle-less similarity/dedup extensions. */
class SimSpec extends SparkSpec {

  test("sim_search_lsh candidates are a subset re-rank of the exact metric") {
    val exact = SparkEntry.queries("sim_search_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = SparkEntry.queries("sim_search_lsh")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(lsh.nonEmpty && lsh.length <= 10)
    // Any LSH hit that is also an exact top-10 member must carry the same
    // cosine (both compute the exact metric on the survivor set).
    lsh.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(math.abs(e - c) < 1e-9)) }
    // Recall of the exact top-10: random hyperplanes at Hamming<=5 of 16
    // bits; empirically well above 0.3 on the fixture — assert a floor.
    val recall = exact.keySet.count(k => lsh.exists(_._1 == k)) / 10.0
    assert(recall >= 0.3, s"recall@10 = $recall")
  }

  test("text_simhash pairs are well-formed and bounded by the band blocking") {
    val df = SparkEntry.queries("text_simhash")(spark, sf)
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 8)
    }
  }

  test("simhash of identical texts collides; near-identical texts are close") {
    import spark.implicits._
    // Build a tiny corpus with a known near-dup pair through the same
    // signature expression the query uses.
    val hs = transform(array_distinct(split(col("text"), " ")), t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, lit(1L << j)).otherwise(0L)
    }
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, base), (2L, base),
      (3L, base + " lambda"),
      (4L, "completely different words entirely unrelated corpus content here now")
    ).toDF("doc_id", "text").select(col("doc_id"), bits.reduce(_ + _).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L), "identical text must produce identical simhash")
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) < java.lang.Long.bitCount(m(1L) ^ m(4L)),
      "near-dup must be closer in Hamming space than unrelated text")
  }

  test("dedup_embed_cosine: pairs symmetric-free, cosine in [0.35, 1]") {
    val rows = SparkEntry.queries("dedup_embed_cosine")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      val c = r.getDouble(3)
      assert(c >= 0.35 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("text_langid predicts a declared language or 'und'") {
    val df = SparkEntry.queries("text_langid")(spark, sf)
    val preds = df.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("de", "en", "es", "fr", "zh", "und")))
    assert(df.count() === Tables.documents(spark, sf).count())
  }

  test("text_fingerprint is deterministic and content-sensitive") {
    val a = SparkEntry.queries("text_fingerprint")(spark, sf).collect()
    val b = SparkEntry.queries("text_fingerprint")(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.map(_.getLong(1)).distinct.length > 1)
  }
}
