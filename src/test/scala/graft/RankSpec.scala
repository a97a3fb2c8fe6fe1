package graft

import org.apache.spark.sql.functions._
import graft.queries.RankQueries

/** Ranking family: BM25 axioms on a synthetic corpus through the engine's
  * own bm25Fit code path (the zipfFit-harness convention), the exact RRF
  * weight table, and an independent recomputation of the fused RRF output
  * from the emitted ranks. */
class RankSpec extends SparkSpec {

  import spark.implicits._

  private val pad = "pad"  // never a query term

  private def fit(rows: Seq[(Long, String)]) =
    RankQueries.bm25Fit(rows.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()

  test("bm25: tf monotonicity at equal length — more query-term hits score higher") {
    // doc 1 has 2x 'filter', doc 2 has 1x, both length 6; doc 3 has none.
    val rows = fit(Seq(
      (1L, s"filter filter $pad $pad $pad $pad"),
      (2L, s"filter $pad $pad $pad $pad $pad"),
      (3L, s"$pad $pad $pad $pad $pad $pad")))
    val score = rows.map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(score(1L) > score(2L))
    assert(score(2L) > score(3L))
    assert(score(3L) == 0.0)  // no query term: every num_i = 0 exactly
  }

  test("bm25: length normalization — same tf, longer doc scores lower") {
    val rows = fit(Seq(
      (1L, s"filter $pad $pad"),
      (2L, "filter " + Seq.fill(9)(pad).mkString(" "))))
    val score = rows.map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(score(1L) > score(2L))
  }

  test("bm25: tf saturation — the k1 asymptote bounds the per-term gain") {
    // score(tf) is increasing but concave: the step from tf=1 to 2 beats
    // the step from tf=8 to 9 (k1 saturation), and every score stays
    // below the tf→∞ asymptote idf*(k1+1) = idf*2.2.
    val mk = (tf: Int) =>
      (tf.toLong, (Seq.fill(tf)("filter") ++ Seq.fill(12 - tf)(pad)).mkString(" "))
    val rows = fit(Seq(mk(1), mk(2), mk(8), mk(9)))
    val s = rows.map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(s(2L) > s(1L) && s(9L) > s(8L))
    assert(s(2L) - s(1L) > s(9L) - s(8L))
    // idf here: n=4 docs all contain 'filter' -> df=4, idf=ln(1+0.5/4.5)
    val idf = math.log(1.0 + 0.5 / 4.5)
    assert(rows.map(_.getDouble(6)).max < idf * 2.2)
  }

  test("rrf weight table is exactly floor(1e12/(60+r)) and strictly decreasing") {
    assert(RankQueries.rrfWeights.size == RankQueries.rrfTop)
    RankQueries.rrfWeights.zipWithIndex.foreach { case (w, i) =>
      assert(w == 1000000000000L / (RankQueries.rrfK + i + 1))
    }
    assert(RankQueries.rrfWeights == RankQueries.rrfWeights.sorted.reverse)
    assert(RankQueries.rrfWeights.distinct.size == RankQueries.rrfTop)
  }

  test("sim_hybrid_rrf: fused score recomputes exactly from emitted ranks") {
    val out = RankQueries.queries("sim_hybrid_rrf")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 2 * RankQueries.rrfTop)
    val w = RankQueries.rrfWeights
    out.foreach { r =>
      val (rl, rv) = (r.getInt(1), r.getInt(2))
      val expect = (if (rl > 0) w(rl - 1) else 0L) + (if (rv > 0) w(rv - 1) else 0L)
      assert(r.getLong(3) == expect, s"row $r")
    }
    // each ranker contributes each rank exactly once
    def ranks(i: Int) = out.map(_.getInt(i)).filter(_ > 0).sorted.toSeq
    assert(ranks(1) == (1 to RankQueries.rrfTop).toSeq)
    assert(ranks(2) == (1 to RankQueries.rrfTop).toSeq)
  }

  test("text_bm25 matches an independent pure-Scala BM25 (round-3 tolerance)") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val terms = RankQueries.queryTerms
    val dl = docs.map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
    val n = docs.length.toLong
    val totdl = dl.values.sum
    val dfm = terms.map(t => t -> docs.count(_._2.split(" ").contains(t)).toLong).toMap
    def score(id: Long, text: String): Double = {
      val tks = text.split(" ")
      terms.map { t =>
        val tf = tks.count(_ == t).toLong
        val idf = math.log(1.0 + ((n - dfm(t)).toDouble + 0.5) / (dfm(t).toDouble + 0.5))
        idf * ((22L * tf * totdl).toDouble / (10L * tf * totdl + 3L * totdl + 9L * dl(id) * n).toDouble)
      }.sum
    }
    val expected = docs.map { case (id, t) => id -> score(id, t) }.toMap
    val out = RankQueries.queries("text_bm25")(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(math.abs(r.getDouble(6) - expected(id)) < 5.01e-4, s"doc $id")
    }
    // the emitted ten are the true top ten (with >1e-9 separation from #11
    // this is engine-order-independent on this fixture)
    val top = expected.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet == top)
  }
}
