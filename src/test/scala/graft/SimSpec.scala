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

  test("sim_recall_eval: recall well-formed, above the nprobe/cells chance floor") {
    val rows = SparkEntry.queries("sim_recall_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 8, "one row per probe")
    rows.foreach { case (qid, nHit, rec) =>
      assert(qid >= 16L && qid <= 23L)
      assert(nHit >= 0L && nHit <= 10L)
      assert(math.abs(rec - nHit / 10.0) < 1e-9, "recall must equal n_hit/10")
    }
    // probing 4 of 16 cells blindly would land ~0.25; the coarse
    // quantizer must do meaningfully better (0.56/0.43/0.51 measured at
    // the three SFs — floor at 0.3)
    val mean = rows.map(_._3).sum / rows.length
    assert(mean >= 0.3, s"mean recall@10 = $mean")
  }

  test("sim_probe_sweep: monotone in nprobe, consistent with sim_recall_eval at np=4") {
    val rows = SparkEntry.queries("sim_probe_sweep")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4, 8))
    // probed cell sets are nested, so hits can only grow with nprobe
    rows.zip(rows.tail).foreach { case ((_, a, _), (_, b, _)) =>
      assert(a <= b, s"recall must be monotone in nprobe: $rows") }
    rows.foreach { case (_, h, r) =>
      assert(h >= 0L && h <= 80L)
      assert(math.abs(r - math.rint(h.toDouble / 80.0 * 1e6) / 1e6) < 1.1e-6)
    }
    // np=4 is EXACTLY the sim_recall_eval configuration — totals must agree
    val evalHits = SparkEntry.queries("sim_recall_eval")(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(rows.find(_._1 == 4).get._2 === evalHits,
      "np=4 sweep row must reproduce sim_recall_eval's total hits")
  }

  test("sim_search_lsh_batch: exact cosines on candidates, bounded recall vs brute force") {
    import graft.queries.Qutil
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = e.where(col("vec_id") >= 20).crossJoin(q)
      .withColumn("cos", Qutil.cosineD(col("embedding"), col("qv")))
      .where(!isnan(col("cos")))
      .collect().map(r => (r.getAs[Long]("qid"), r.getLong(0), r.getAs[Double]("cos")))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).take(3).map(_._2).toSet).toMap
    val got = SparkEntry.queries("sim_search_lsh_batch")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty)
    // every query answered, at most 3 results each
    val perQ = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(perQ.values.forall(_.size <= 3))
    // recall@3 of the brute-force answer across all queries: 16 bands of
    // 4 bits pass a true near neighbor with high probability — floor 0.5
    val hits = perQ.toSeq.map { case (qid, ids) =>
      brute.get(qid).map(b => ids.intersect(b).size.toDouble / b.size.max(1)).getOrElse(1.0)
    }
    val recall = hits.sum / hits.length
    assert(recall >= 0.5, s"mean recall@3 = $recall")
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

  test("embedBandPairs: banded candidates recover the exact cosine pairs (recall)") {
    // sf0.01: 26 exact pairs at cos >= 0.35 — enough for a non-vacuous
    // recall floor (sf0.001 has only 14; 3 misses there is sample noise,
    // not a geometry regression).
    val d = TestSession.sf001
    val exact = graft.queries.SimQueries.cosinePairs(spark, d)
      .select(col("a_id"), col("b_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val banded = graft.queries.SimQueries.embedBandPairs(spark, d)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // The banded generator re-checks candidates with the SAME exact cosine,
    // so its output is a strict subset of the exact pair set: banding can
    // only lose pairs (false negatives), never invent them.
    assert(banded.subsetOf(exact.keySet),
      s"banded pairs not a subset of exact: ${banded.diff(exact.keySet)}")
    // The r4 verdict's acceptance bar: every strongly-similar pair
    // (cos >= 0.5) must be recovered. Fixture pairs concentrate at
    // 0.35-0.51, so also pin a 0.9 recall floor at the full 0.35
    // threshold — the harder regime (p_bit ~= 0.614 per hyperplane).
    val strong = exact.collect { case (p, c) if c >= 0.5 => p }
    assert(strong.forall(banded),
      s"cos>=0.5 pairs missed by banding: ${strong.filterNot(banded)}")
    val recall = if (exact.isEmpty) 1.0 else banded.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@0.35 = $recall (${banded.size}/${exact.size})")
  }

  test("dedup_embed_survivor: one max-norm member per banded cluster") {
    // Cross-check against dedup_cluster_embed_lsh (the membership view of
    // the SAME banded pair graph): every cluster yields exactly one
    // survivor, the survivor is a member, csize matches the membership
    // count, and no member beats the survivor on (norm desc, vec_id asc).
    val members = SparkEntry.queries("dedup_cluster_embed_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))           // (vec_id, cluster)
    val byCluster = members.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    val norms = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.queries.Qutil.normD(col("embedding")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val surv = SparkEntry.queries("dedup_embed_survivor")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))       // (cluster, survivor, csize)
    assert(surv.length === byCluster.size)
    assert(surv.map(_._1).distinct.length === surv.length)
    surv.foreach { case (c, s, n) =>
      val mem = byCluster(c)
      assert(mem.contains(s), s"survivor $s not in cluster $c")
      assert(n === mem.size.toLong, s"csize mismatch for cluster $c")
      val best = mem.minBy(id => (-norms(id), id))
      assert(s === best, s"cluster $c: survivor $s != argmax-norm $best")
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

  test("sim_hard_negatives: exact agreement with an in-memory brute force") {
    import graft.Tables
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // the while-loop left fold is the exact dotD mirror (the r6b
    // list_sum == left-fold fact), so ranks need no tolerance
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    val expected = vecs.filter(_._1 < 8L).sortBy(_._1).flatMap {
      case (qid, ql, qv) =>
        val qn = math.sqrt(dot(qv, qv))
        vecs.filter(_._2 != ql)
          .map { case (cid, cl, cv) =>
            (cid, cl, dot(cv, qv) / (math.sqrt(dot(cv, cv)) * qn)) }
          .filterNot(_._3.isNaN)
          .sortBy { case (cid, _, c) => (-c, cid) }
          .take(3).zipWithIndex
          .map { case ((cid, cl, _), i) => (qid, i + 1, cid, cl) }
    }
    val got = SparkEntry.queries("sim_hard_negatives")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(got.toSeq === expected.toSeq)
    // every emitted negative really is differently labeled
    val labels = vecs.map(v => v._1 -> v._2).toMap
    got.foreach { case (qid, _, nid, nl) =>
      assert(labels(nid) === nl)
      assert(nl != labels(qid))
    }
  }

  test("dq_embed_contamination: subset of + consistent with a brute-force cross-split reference") {
    def hash60(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def splitOf(id: Long): String = {
      val b = hash60("split:" + id) % 100
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = all.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val vecs = all.toMap
    val train = all.map(_._1).filter(splitOf(_) == "train")
    val test = all.map(_._1).filter(splitOf(_) == "test")
    // brute force: EVERY test×train pair (the reference the banding
    // approximates)
    val brute = test.map { t =>
      val ms = train.map(tr => tr -> dot(vecs(t), vecs(tr)) / (nrm(t) * nrm(tr)))
        .filter(p => !p._2.isNaN && p._2 >= 0.35)
      t -> ms
    }.filter(_._2.nonEmpty).toMap
    val rows = SparkEntry.queries("dq_embed_contamination")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "the fixture must surface cross-split semantic overlap")
    rows.foreach { case (t, n, nt, mc) =>
      val ms = brute.getOrElse(t, fail(s"test vec $t not in the brute reference"))
      // banding only ever MISSES pairs — never invents them
      assert(n <= ms.length.toLong, s"vec $t match count exceeds brute force")
      val nearestCos = ms.toMap.getOrElse(nt, fail(s"vec $t nearest $nt not a brute pair"))
      assert(math.abs(mc - nearestCos) < 1e-5, s"vec $t nearest cosine value")
      // +1e-6: the r6 display rounding can land up to 5e-7 above raw
      assert(mc <= ms.map(_._2).max + 1e-6, s"vec $t max_cos bound")
    }
    // banding recall on flagged test vectors (measured ~0.9+ at this
    // threshold — the r5 S-curve geometry): at least 80% of truly-
    // contaminated test vecs are surfaced
    assert(rows.length.toDouble >= 0.8 * brute.size,
      s"recall too low: ${rows.length} of ${brute.size} flagged")
  }

  test("sim_search_mmr: greedy optimality at every rank; seed = exact top-1") {
    // independent check of the GREEDY CONTRACT: recompute the candidate
    // pool and micro-unit scores, then verify each emitted pick strictly
    // maximizes (rel - max sim to the already-selected set) among the
    // remaining candidates under the (score DESC, vec_id) tie rule.
    val out = SparkEntry.queries("sim_search_mmr")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq === (1 to 5))
    assert(out.map(_._2).distinct.length === 5, "picks must be distinct")
    // candidate pool: exact top-12 by cosine to vec 0 (brute force)
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val qv = all(0L)
    val nq = math.sqrt(dot(qv, qv))
    val pool = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(v, qv) / (math.sqrt(dot(v, v)) * nq)) }
      .sortBy { case (id, c) => (-c, id) }.take(12)
    val relU = pool.map { case (id, c) => id -> math.floor(c * 1e6 + 0.5).toLong }.toMap
    assert(out.forall(p => relU.contains(p._2)), "picks must come from the top-12 pool")
    assert(out.head._2 === pool.head._1, "rank 1 must be the exact top-1")
    def simU(a: Long, b: Long): Long = {
      val (va, vb) = (all(a), all(b))
      math.floor(dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))) * 1e6 + 0.5).toLong
    }
    out.foreach { case (k, id, r, mm) =>
      assert(r === relU(id), s"rank $k rel")
      val selected = out.filter(_._1 < k).map(_._2)
      val expMm = if (selected.isEmpty) r else r - selected.map(simU(id, _)).max
      assert(mm === expMm, s"rank $k mmr score")
      // no remaining candidate beats this pick under the tie rule
      val remaining = pool.map(_._1).filterNot(selected.contains).filterNot(_ == id)
      remaining.foreach { u =>
        val uMm = if (selected.isEmpty) relU(u)
                  else relU(u) - selected.map(simU(u, _)).max
        assert(uMm < mm || (uMm == mm && id < u), s"rank $k: candidate $u beats pick $id")
      }
    }
  }
}
