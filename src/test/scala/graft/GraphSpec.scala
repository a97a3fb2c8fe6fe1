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

  test("graph_hits equals an in-memory integer max-normalized reference (sf0.001)") {
    // same directed bipartite edge set, same recurrence: a = norm(A'h),
    // h = norm(Aa), norm(x) = (x * 1e6) / max — BigInt products mirror
    // the query's DECIMAL(38,0) cross-multiplication exactly.
    val ed = Tables.lineitem(spark, sf).select("l_suppkey", "l_orderkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var hub = ed.map(_._1).distinct.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = BigInt(m.values.max)
      m.map { case (k, v) => k -> ((BigInt(v) * 1000000) / mx).toLong }
    }
    for (_ <- 1 to 3) {
      auth = norm(ed.groupBy(_._2).map { case (c, es) => c -> es.map(e => hub(e._1)).sum })
      hub = norm(ed.groupBy(_._1).map { case (s, es) => s -> es.map(e => auth(e._2)).sum })
    }
    val expH = hub.toSeq.sortBy { case (id, v) => (-v, id) }.take(12)
    val expA = auth.toSeq.sortBy { case (id, v) => (-v, id) }.take(12)
    val got = SparkEntry.queries("graph_hits")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.filter(_._1 == "hub").map(t => (t._2, t._3)).toSeq === expH)
    assert(got.filter(_._1 == "authority").map(t => (t._2, t._3)).toSeq === expA)
    // normalization invariant: each side's max score is exactly 1e6
    assert(got.filter(_._1 == "hub").map(_._3).max === 1000000L)
    assert(got.filter(_._1 == "authority").map(_._3).max === 1000000L)
  }

  test("graph_katz equals an in-memory integer reference (sf0.001)") {
    // same undirected edge set as pagerank's reference; BigInt sums
    // mirror the query's DECIMAL(38,0) aggregation; k' = 1e6 + Σk(u) / 8
    val e0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    var katz = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val s = scala.collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
      edges.foreach { case (u, v) => s(v) += katz(u) }
      katz = s.map { case (v, t) => v -> (1000000L + (t / 8).toLong) }.toMap
    }
    val expTop = katz.toSeq.sortBy { case (id, k) => (-k, id) }.take(20)
    val got = SparkEntry.queries("graph_katz")(spark, sf)
      .select("node", "katz").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === expTop, "distributed Katz scores diverge from the reference")
    // Katz floor: every score carries the +1e6 seed of its last round
    assert(katz.values.forall(_ >= 1000000L))
  }

  test("graph_label_prop equals an in-memory synchronous LPA reference (sf0.001)") {
    val e0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    var lbl = edges.map(_._1).distinct.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = edges.groupBy(_._2).map { case (v, es) =>
        val votes = es.map(e => lbl(e._1)).groupBy(identity).view.mapValues(_.size)
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expComm = lbl.groupBy(_._2).map { case (l, ms) =>
      l -> (ms.size.toLong, ms.keys.count(_ % 2 == 0).toLong,
        ms.keys.count(_ % 2 == 1).toLong, ms.keys.min)
    }
    val got = SparkEntry.queries("graph_label_prop")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === expComm, "community summary diverges from the reference")
    // every node is accounted for exactly once
    assert(got.values.map(_._1).sum === lbl.size.toLong)
  }

  test("graph_assortativity equals an in-memory moment recompute (sf0.001)") {
    val e0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = edges.size.toLong
    // exact integer moments (BigInt mirrors the DECIMAL(38,0) sums),
    // one correctly-rounded toDouble each, then the shared formula order
    val sx = edges.map(e => BigInt(deg(e._1))).sum
    val sxx = edges.map(e => BigInt(deg(e._1)) * deg(e._1)).sum
    val sxy = edges.map(e => BigInt(deg(e._1)) * deg(e._2)).sum
    val (md, sxd, sxxd, sxyd) = (m.toDouble, sx.toDouble, sxx.toDouble, sxy.toDouble)
    val den = md * sxxd - sxd * sxd
    assert(den != 0.0, "fixture graph is degree-regular — test fixture broke")
    val expR = math.rint((md * sxyd - sxd * sxd) / den * 1e6) / 1e6
    val r = SparkEntry.queries("graph_assortativity")(spark, sf).collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === m, "directed edge count")
    assert(math.abs(r(0).getDouble(1) - math.rint(sxd / md * 1e6) / 1e6) < 1.1e-6)
    val got = r(0).getDouble(2)
    assert(math.abs(got - expR) < 1.1e-6, s"assortativity: $got vs $expR")
    assert(got >= -1.0 && got <= 1.0, "Pearson r out of range")
  }

  /** In-memory supported co-purchase edges (p1 < p2, support >= 2) —
    * independent reference for the two market-basket queries. */
  private def refEdges: Map[(Long, Long), Long] = {
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    baskets.toSeq.flatMap(ps =>
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).collect { case (e, os) if os.size >= 2 => e -> os.size.toLong }
      .toMap
  }

  test("graph_basket_affinity equals an in-memory pair/support/lift reference") {
    val edges = refEdges
    val nBaskets = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    val got = SparkEntry.queries("graph_basket_affinity")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === edges.keySet, "supported pair set diverges")
    val itemSup = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case ((p1, p2), (sup, s1, s2, lift)) =>
      assert(sup === edges((p1, p2)), s"support of ($p1,$p2)")
      assert(s1 === itemSup(p1) && s2 === itemSup(p2), s"item supports of ($p1,$p2)")
      assert(sup <= math.min(s1, s2), "support cannot exceed either item support")
      val refLift = math.rint(sup.toDouble * nBaskets / (s1.toDouble * s2.toDouble) * 1e6) / 1e6
      assert(math.abs(lift - refLift) < 1.1e-6, s"lift of ($p1,$p2): $lift vs $refLift")
    }
  }

  test("graph_jaccard_nbr equals an in-memory set-overlap reference") {
    val edges = refEdges
    val itemSup = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("graph_jaccard_nbr")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === edges.keySet, "scored pair set diverges")
    got.foreach { case ((p1, p2), (common, da, db, j)) =>
      assert(common === edges((p1, p2)), s"common of ($p1,$p2)")
      assert(da === itemSup(p1) && db === itemSup(p2), s"degrees of ($p1,$p2)")
      val refJ = math.rint(common.toDouble / (da + db - common).toDouble * 1e6) / 1e6
      assert(math.abs(j - refJ) < 1.1e-6, s"jaccard of ($p1,$p2): $j vs $refJ")
      // Jaccard is a similarity in (0,1]; 1 iff identical basket sets
      assert(j > 0.0 && j <= 1.0)
      assert((j == 1.0) === (common == da && common == db))
    }
  }

  test("graph_adamic_adar equals an in-memory exact-integer-weight reference") {
    // re-derive the nano-unit weights independently (same formula the
    // engine's aaWeights literal bakes in) and fold pairs basket-by-
    // basket — integer sums, so exact equality modulo the final r6
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted).filter(_.length >= 2)
    def w(k: Int): Long =
      math.floor(1.0e9 / math.log(math.min(k, 65).toDouble) + 0.5).toLong
    val acc = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    baskets.foreach { ps =>
      val wk = w(ps.length)
      for (i <- ps.indices; j <- (i + 1) until ps.length) {
        val key = (ps(i), ps(j))
        val (sw, c) = acc.getOrElse(key, (0L, 0L))
        acc(key) = (sw + wk, c + 1)
      }
    }
    val ref = acc.collect { case (k, (sw, c)) if c >= 2 => k -> (sw, c) }.toMap
    val got = SparkEntry.queries("graph_adamic_adar")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === ref.keySet, "scored pair set diverges")
    got.foreach { case (k, (common, score)) =>
      val (sw, c) = ref(k)
      assert(common === c, s"common baskets of $k")
      val refScore = math.rint(sw.toDouble / 1.0e9 * 1e6) / 1e6
      assert(math.abs(score - refScore) < 1.1e-6, s"score of $k: $score vs $refScore")
      assert(score > 0.0)
    }
  }

  test("graph_triangles equals an in-memory enumeration; every edge is supported") {
    val edges = refEdges.keySet
    val byA = edges.groupBy(_._1)
    val refTris = (for {
      (a, b) <- edges.toSeq
      (_, c) <- byA.getOrElse(b, Set.empty)
      if edges.contains((a, c))
    } yield (a, b, c)).toSet
    val got = SparkEntry.queries("graph_triangles")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === got.distinct.length, "a triangle was emitted twice")
    assert(got.toSet === refTris, "triangle set diverges from the reference")
    assert(refTris.nonEmpty, "fixture must contain triangles")
    got.foreach { case (a, b, c) =>
      assert(a < b && b < c, s"ordering invariant broken: ($a,$b,$c)") }
  }

  test("graph_modularity equals an in-memory computation on the LPA reference labels") {
    val e0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    var lbl = edges.map(_._1).distinct.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = edges.groupBy(_._2).map { case (v, es) =>
        val votes = es.map(e => lbl(e._1)).groupBy(identity).view.mapValues(_.size)
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m2 = edges.length.toLong
    val perD = edges.groupBy(e => lbl(e._1)).view.mapValues(_.size.toLong).toMap
    val perI = edges.filter(e => lbl(e._1) == lbl(e._2))
      .groupBy(e => lbl(e._1)).view.mapValues(_.size.toLong).toMap
    val see = perI.values.sum
    val sdd = perD.values.map(d => d * d).sum
    val expQ = (m2.toDouble * see.toDouble - sdd.toDouble) / (m2.toDouble * m2.toDouble)
    val r = SparkEntry.queries("graph_modularity")(spark, sf).head()
    assert(r.getLong(0) === perD.size.toLong)
    assert(r.getLong(1) === m2 && r.getLong(2) === see)
    assert(math.abs(r.getDouble(3) - expQ) < 1.1e-6, s"Q ${r.getDouble(3)} vs $expQ")
    // intra edges can never exceed the total; Q is bounded above by 1
    assert(see <= m2 && r.getDouble(3) <= 1.0)
  }

  test("graph_bfs_dist equals an in-memory BFS census (sf0.001)") {
    val e0 = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e0 ++ e0.map { case (a, b) => (b, a) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Tables.supplier(spark, sf).where(col("s_suppkey") % 7 === 0)
      .select((col("s_suppkey") * 2).as("id")).collect().map(_.getLong(0)).toSet
    assert(seeds.nonEmpty, "seed set must be non-empty at sf0.001")
    // textbook frontier BFS to depth 3
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (dd <- 1L to 3L) {
      frontier = frontier.flatMap(u => adj.getOrElse(u, Array.empty[Long]))
        .filterNot(dist.contains(_))
      dist = dist ++ frontier.map(_ -> dd)
    }
    val refCensus = dist.groupBy(_._2).map { case (dd, m) =>
      val ids = m.keys.toSeq
      dd -> (ids.size.toLong, ids.count(_ % 2 == 0).toLong,
        ids.count(_ % 2 == 1).toLong, ids.min, ids.max)
    }
    val got = SparkEntry.queries("graph_bfs_dist")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got === refCensus, "BFS census diverges from the frontier reference")
  }

  test("graph_components equals a driver union-find over the same pair rule") {
    // independent reference: union-find over co-purchase pairs with
    // support >= 2 (the supportedPairs contract re-derived from raw
    // lineitem), singletons included via the full basketed-part node set.
    val rows = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = rows.map(_._2).distinct
    val pairCnt = rows.groupBy(_._1).values.flatMap { basket =>
      val pks = basket.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length) yield (pks(i), pks(j))
    }.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairCnt.filter(_._2 >= 2).keys.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val refHist = nodes.groupBy(find).values.map(_.size.toLong).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sorted
    val got = SparkEntry.queries("graph_components")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === refHist, "component-size histogram diverges from union-find")
    // masses close over the node set
    assert(got.map { case (sz, n) => sz * n }.sum === nodes.length.toLong)
  }
}
