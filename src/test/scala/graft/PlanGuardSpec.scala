package graft

/** Catalog-wide plan contracts — PLANS.md's audit findings as
  * failing-on-regression assertions. A query can silently lose its scale
  * posture (a hint dropped, a planner change re-broadcasting an unbounded
  * side, a global window reintroduced); these tests pin the constructs
  * that must never (re)appear in any declared plan. */
class PlanGuardSpec extends SparkSpec {

  // join_cross is the deliberately-bounded 5x25 Cartesian demo.
  private val cartesianOk = Set("join_cross")

  /** A SinglePartition exchange is scale-safe ONLY when it feeds the final
    * stage of a keyless (scalar) aggregate: the shuffled stream is the
    * map-side partials — one row per upstream partition, bounded at any
    * data size. Anything else funneled to one partition is an OOM at 100x. */
  private def unboundedSinglePartitions(plan: String): Seq[String] = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange SinglePartition") &&
        !(i + 1 < lines.length && lines(i + 1).contains("keys=[]") &&
          lines(i + 1).contains("partial_")) =>
        lines.lift(i + 1).getOrElse(l).trim.take(80)
    }
  }

  test("catalog-wide: no CartesianProduct, no unbounded single-partition Exchange") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = if (!cartesianOk(name) && plan.contains("CartesianProduct"))
          Seq(s"$name: CartesianProduct") else Nil
        cart ++ unboundedSinglePartitions(plan)
          .map(c => s"$name: Exchange SinglePartition over [$c]")
    }
    assert(offenders.isEmpty,
      s"scale-unsafe constructs crept back into declared plans:\n${offenders.mkString("\n")}")
  }

  test("top-k windows prune via WindowGroupLimit") {
    for (q <- Seq("win_topk_per_group", "sample_cap_per_source")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$q must prune each group to K rows before the window sort:\n$plan")
    }
  }

  test("topk_global plans as TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("topk_global")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("salted self-joins stay sort-merge (no unbounded broadcast build side)") {
    // The pair-enumeration joins carry a merge hint precisely because a
    // size-chosen broadcast of the whole table is the r1 defect; pin it.
    for (q <- Seq("sim_join_label", "dedup_embed_cosine", "text_near_dup_jaccard")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"$q pair join must be sort-merge:\n$plan")
    }
    // sim_join_label joins nothing bounded — its plan must have NO
    // broadcast at all (jaccard's tiny dict/nwords broadcasts are fine).
    val p = SparkEntry.queries("sim_join_label")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange"),
      s"sim_join_label must not broadcast the embeddings table:\n$p")
  }

  test("win_ntile_pctrank's window is partitioned (two-pass form)") {
    val plan = SparkEntry.queries("win_ntile_pctrank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.contains("__pid"),
      s"window must partition by the range-partition id:\n$plan")
  }
}
