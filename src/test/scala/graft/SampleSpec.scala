package graft

import org.apache.spark.sql.functions._

/** Invariants of the deterministic sampling operators (SURVEY §2.12,
  * round 3) — the properties that make them safe at corpus-rebuild scale,
  * beyond the cell-level oracle parity the driver already checks. */
class SampleSpec extends SparkSpec {

  test("split_train_test is stable under corpus subsetting (no leakage drift)") {
    // A doc's split must be a pure function of doc_id: recomputing on an
    // arbitrary half of the corpus yields the identical assignment. This is
    // the invariant rand()/row_number-based splitters break.
    val full = SparkEntry.queries("split_train_test")(spark, sf)
      .select("doc_id", "split")
    val half = Tables.documents(spark, sf).where(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_split_half").toString
    half.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val onHalf = SparkEntry.queries("split_train_test")(spark, dir)
      .select("doc_id", "split")
    val joined = onHalf.as("h").join(full.as("f"), "doc_id")
      .where(col("h.split") =!= col("f.split"))
    assert(joined.count() === 0, "subset recompute must not move any doc's split")
    // and the 80/10/10 buckets are all populated
    val counts = full.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "valid", "test"))
    assert(counts("train") > counts("valid") && counts("train") > counts("test"))
  }

  test("split_by_content co-assigns exact duplicates; buckets populated") {
    val rows = SparkEntry.queries("split_by_content")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length.toLong === Tables.documents(spark, sf).count())
    // the leakage guard: every normalized-content group lands in ONE split
    val byHash = rows.groupBy(_._2)
    byHash.foreach { case (h, g) =>
      assert(g.map(_._3).distinct.length === 1,
        s"content $h straddles splits: ${g.map(_._3).distinct}")
    }
    // exercise the guard on PLANTED duplicates (sf0.001 has none): two
    // byte-identical docs and a case/punct variant must co-assign; the
    // id-keyed splitter is the broken control
    val planted = Tables.documents(spark, sf).limit(1).selectExpr("text").collect()(0).getString(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_split_content").toString
    import spark.implicits._
    Seq((1L, "a", planted), (2L, "b", planted), (3L, "c", planted.toUpperCase + "!!"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p = SparkEntry.queries("split_by_content")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(p.map(_._2).distinct.length === 1,
      "planted exact+normalized duplicates must share one split")
    val counts = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert(counts.keySet.subsetOf(Set("train", "valid", "test")))
    assert(counts("train") > counts.getOrElse("valid", 0) &&
      counts("train") > counts.getOrElse("test", 0))
  }

  test("sample_pack_sequences: per-source packing chain is gapless and exhaustive") {
    val rows = SparkEntry.queries("sample_pack_sequences")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(rows.length.toLong === Tables.documents(spark, sf).count())
    rows.groupBy(_._1).foreach { case (src, g) =>
      // reconstruct the concat stream: positions sorted ascending must
      // chain exactly (next start = prev start + prev token count)
      val chain = g.map(t => (t._4 * 512 + t._5, t._3)).sortBy(_._1)
      assert(chain.head._1 === 0L, s"$src stream must start at offset 0")
      chain.zip(chain.tail).foreach { case ((c0, n0), (c1, _)) =>
        assert(c1 === c0 + n0, s"$src packing chain has a gap at $c0") }
      // offsets live inside the context window
      g.foreach(t => assert(t._5 >= 0 && t._5 < 512, s"$src offset ${t._5}"))
      // every doc's start lands in the sequence its offset claims
      val total = chain.last._1 + chain.last._2
      assert(g.map(_._3.toLong).sum === total, s"$src token mass")
      assert(g.map(_._4).max === chain.last._1 / 512, s"$src last sequence id")
    }
  }

  test("sample_kfold partitions the corpus, covers all folds, and balances") {
    val rows = SparkEntry.queries("sample_kfold")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    // folds partition the corpus exactly
    assert(rows.map(_.getLong(2)).sum === nDocs, "fold census must cover every doc once")
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 5))
    val perFold = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perFold.keySet === (0 until 5).toSet, "every fold must be populated")
    // hash balance: no fold strays past 2x the uniform share (hash noise
    // at sf0.001 is a few percent; 2x is a broken-hash detector, not a
    // statistical bound)
    val uniform = nDocs.toDouble / 5.0
    perFold.values.foreach(n =>
      assert(n.toDouble > 0.5 * uniform && n.toDouble < 2.0 * uniform,
        s"fold imbalance: $perFold"))
    // token mass is consistent with the corpus total
    val totTok = Tables.documents(spark, sf)
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS t")
      .agg(sum("t")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(3)).sum === totTok, "token mass must partition too")
  }

  test("sample_stratified keeps full-rate sources whole and respects rates") {
    val sampled = SparkEntry.queries("sample_stratified")(spark, sf)
    val perSource = Tables.documents(spark, sf).groupBy("source")
      .agg(count(lit(1)).as("total"))
      .join(sampled.groupBy("source").agg(count(lit(1)).as("kept")), Seq("source"), "left")
      .na.fill(0, Seq("kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((src, (total, kept)) <- perSource) {
      val n = src.stripPrefix("src").toInt
      if (n < 5) assert(kept === total, s"$src is a full-rate source, kept $kept/$total")
      else assert(kept <= total, s"$src kept more than exists")
    }
    // downsampled tiers keep strictly less than everything, in aggregate
    val (dsTotal, dsKept) = perSource.collect {
      case (src, t) if src.stripPrefix("src").toInt >= 5 => t
    }.foldLeft((0L, 0L)) { case ((a, b), (t, k)) => (a + t, b + k) }
    assert(dsKept < dsTotal, "downsampled tiers must actually drop rows")
  }

  test("sample_token_budget: budget bound, first-doc guarantee, subset stability") {
    val kept = SparkEntry.queries("sample_token_budget")(spark, sf)
    // exclusive-cumsum selection: everything BEFORE a kept doc fits under
    // budget, so kept tokens minus the (possibly overshooting) last doc
    // stay under the shared budget per source (ONE constant: SampleQueries.tokenBudget)
    val bad = kept.where(col("cum_before") >= graft.queries.SampleQueries.tokenBudget)
    assert(bad.count() === 0, "a doc was kept after its source's budget was spent")
    // every source with at least one doc contributes at least one doc
    val srcAll = Tables.documents(spark, sf).select("source").distinct().count()
    val srcKept = kept.select("source").distinct().count()
    assert(srcKept === srcAll, "a non-empty source contributed nothing")
    // selection order is a pure hash function: dropping the docs that were
    // NOT selected and re-running selects the identical set (the prefix of
    // the hash order is unchanged) — the incremental-rebuild invariant
    val dir = java.nio.file.Files.createTempDirectory("graft_budget").toString
    Tables.documents(spark, sf)
      .join(kept.select("doc_id"), Seq("doc_id"), "semi")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rerun = SparkEntry.queries("sample_token_budget")(spark, dir)
    assert(rerun.select("doc_id").except(kept.select("doc_id")).count() === 0 &&
      kept.select("doc_id").except(rerun.select("doc_id")).count() === 0,
      "re-running on the kept subset must select the same docs")
  }

  test("sample_quality_weighted selects in proportion to quality") {
    val kept = SparkEntry.queries("sample_quality_weighted")(spark, sf)
    val quality = SparkEntry.queries("text_quality")(spark, sf)
      .select(col("doc_id"), col("quality_score").as("q"))
    val dropped = quality.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val keptN = kept.count()
    assert(keptN > 0 && keptN < quality.count(), "selection must be non-trivial")
    // weighted Bernoulli: kept docs average a higher quality than dropped
    val avgKept = quality.join(kept.select("doc_id"), "doc_id")
      .agg(avg("q")).head.getDouble(0)
    val avgDrop = dropped.agg(avg("q")).head.getDouble(0)
    assert(avgKept > avgDrop, s"kept avg $avgKept !> dropped avg $avgDrop")
    // selection is a pure per-doc function: recompute on the kept subset
    // re-selects everything (membership never depends on other docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_qmix").toString
    Tables.documents(spark, sf)
      .join(kept.select("doc_id"), Seq("doc_id"), "semi")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rerun = SparkEntry.queries("sample_quality_weighted")(spark, dir)
    assert(rerun.count() === keptN &&
      rerun.select("doc_id").except(kept.select("doc_id")).count() === 0)
  }

  test("sample_cap_per_source caps at 15 and keeps the highest-quality docs") {
    val capped = SparkEntry.queries("sample_cap_per_source")(spark, sf)
    val maxPer = capped.groupBy("source").count()
      .agg(max("count")).head.getLong(0)
    assert(maxPer <= 15L)
    // survivors dominate: per source, the minimum kept quality >= the
    // maximum dropped quality (ties broken by doc_id are still >=).
    // text_quality emits the same shared score formula per doc.
    val all = SparkEntry.queries("text_quality")(spark, sf)
      .select(col("doc_id"), col("quality_score").as("q"))
      .join(Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
    val dropped = all.join(capped.select("doc_id"), Seq("doc_id"), "left_anti")
    val minKept = capped.groupBy("source").agg(min("quality").as("min_kept"))
    val maxDrop = dropped.groupBy("source").agg(max("q").as("max_drop"))
    val bad = minKept.join(maxDrop, "source")
      .where(col("max_drop") > col("min_kept"))
    assert(bad.count() === 0, "a dropped doc outscored a kept doc in its source")
  }

  test("sample_interleave round-robins all sources before repeating any") {
    val rows = SparkEntry.queries("sample_interleave")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.length === 64)
    assert(rows.map(_._1).toSeq === (1 to 64), "positions are dense and total")
    val nSources = Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    // the (rank, source) order exhausts every source at rank k before
    // any source reaches rank k+1 — the first |sources| positions are
    // one doc from EACH source, and rank blocks never interleave
    val firstBlock = rows.take(nSources).map(_._3)
    assert(firstBlock.distinct.length === nSources,
      "first block must visit every source exactly once")
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq,
      "serve order never returns to a lower rank")
    // rebuild-stable: a second evaluation yields the identical order
    val again = SparkEntry.queries("sample_interleave")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq, "serving order must be deterministic")
  }

  test("sample_target_mix hits every per-source quota and the declared mix") {
    // quotas are derived integers: k_s = floor(num_s * M / 50) with
    // M = min_s floor(n_s * 50 / num_s) — recompute both independently
    // and demand the kept counts equal them EXACTLY; the achieved mix
    // then matches the target weights by construction (each kept count
    // is within one floor step of w_s * total).
    val den = 50L
    val counts = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def num(src: String) = src.drop(3).toLong % 4 + 1
    val m = counts.map { case (s, n) => n * den / num(s) }.min
    val quota = counts.keys.map(s => s -> num(s) * m / den).toMap
    val kept = SparkEntry.queries("sample_target_mix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    val keptBySource = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(keptBySource === quota.filter(_._2 > 0),
      "kept counts must equal the integer quotas exactly")
    kept.foreach { case (_, s, w, q) =>
      assert(w === num(s).toInt && q === quota(s).toInt,
        s"emitted weight/quota mismatch for $s")
    }
    // feasibility: no quota exceeds its source's population
    quota.foreach { case (s, q) => assert(q <= counts(s)) }
  }

  test("sample_temperature_mix quotas follow n^alpha with alpha = 1/2") {
    // recompute weights/quotas independently: w_s = floor(sqrt(n_s)*1000
    // + 0.5), budget = total/2, k_s = min(budget*w_s/W, n_s) — kept
    // counts must equal them EXACTLY; and the temperature property must
    // hold: a source 4x the size of another gets at most ~2x the quota
    // (sub-linear growth), never 4x.
    val counts = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val w = counts.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1000.0 + 0.5).toLong).toMap
    val totN = counts.values.sum
    val totW = w.values.sum
    val quota = counts.keys.map(s =>
      s -> math.min((totN / 2) * w(s) / totW, counts(s))).toMap
    val kept = SparkEntry.queries("sample_temperature_mix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val keptBySource = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(keptBySource === quota.filter(_._2 > 0),
      "kept counts must equal the integer quotas exactly")
    kept.foreach { case (_, s, tw, q) =>
      assert(tw === w(s) && q === quota(s), s"emitted weight/quota mismatch for $s")
    }
    // sub-linearity: for any two sources, quota ratio <= sqrt(count
    // ratio) + a floor step
    for (a <- counts.keys; b <- counts.keys
         if counts(a) >= 4 * counts(b) && quota(b) > 0 && quota(b) < counts(b)) {
      assert(quota(a).toDouble / quota(b) <=
        math.sqrt(counts(a).toDouble / counts(b)) * 1.05 + 1.0,
        s"quota growth must be sub-linear: $a vs $b")
    }
  }

  test("sample_dedup_weighted quotas track per-source unique mass") {
    // recompute the census and quotas independently: nu_s = distinct
    // normalized-content hashes per source, w_s = nu_s*10^4 DIV W,
    // budget = total DIV 2, k_s = min(budget*w_s DIV 10^4, n_s) — kept
    // counts must equal them EXACTLY. Then the composition property:
    // a source's quota share never exceeds its unique-mass share by
    // more than one basis-point floor step (dups down-weight, never
    // up-weight).
    import org.apache.spark.sql.functions.{col, lit, count, countDistinct}
    val census = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        countDistinct(graft.queries.TextQueries.contentHash(col("text"))).as("nu"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val counts = census.map(c => c._1 -> c._2).toMap
    val uniq = census.map(c => c._1 -> c._3).toMap
    val totN = counts.values.sum
    val totU = uniq.values.sum
    val bp = uniq.view.mapValues(nu => nu * 10000L / totU).toMap
    val quota = counts.keys.map(s =>
      s -> math.min((totN / 2) * bp(s) / 10000L, counts(s))).toMap
    val kept = SparkEntry.queries("sample_dedup_weighted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val keptBySource = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(keptBySource === quota.filter(_._2 > 0),
      "kept counts must equal the integer quotas exactly")
    kept.foreach { case (_, s, w, q) =>
      assert(w === bp(s).toInt && q === quota(s),
        s"emitted weight/quota mismatch for $s")
    }
    // down-weighting: quota share tracks unique share, not raw share
    quota.foreach { case (s, q) =>
      assert(q * 10000L <= (totN / 2) * bp(s),
        s"quota for $s exceeds its unique-mass entitlement")
    }
  }

  test("sample_epoch_plan: epoch arithmetic recomputes; division identity holds") {
    import org.apache.spark.sql.functions.{col, split, size => fsize}
    val per = Tables.documents(spark, sf)
      .select(col("source"), fsize(split(col("text"), " ")).cast("long").as("tk"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val tot = per.values.map(_._2).sum
    val got = SparkEntry.queries("sample_epoch_plan")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getLong(6), r.getBoolean(7)))
    assert(got.map(_._1).toSeq === per.keys.toSeq.sorted)
    got.foreach { case (s, w, nDocs, avail, target, epochs, rem, capped) =>
      val num = s.drop(3).toLong % 4 + 1
      assert(w === num.toInt && nDocs === per(s)._1 && avail === per(s)._2)
      assert(target === (tot / 2) * num / 50)
      val div = target / avail
      assert(epochs === math.min(div, 4L).toInt)
      assert(rem === target % avail)
      assert(capped === (div > 4L))
      // the plan reconstructs its target exactly
      assert(div * avail + rem === target)
    }
  }

  test("sample_epoch_repeat: per-doc copy counts recompute; per-source mass within the epoch band") {
    // independent spelling: MessageDigest-based hash, plain Scala policy
    // CASE, explicit floor/fraction arithmetic — not the query's
    // Column/CASE strings
    def hash60(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def epochsBp(src: String): Int = {
      val n = src.drop(3).toInt
      if (n < 5) 10000 else if (n < 13) 15000 else 25000
    }
    def copies(id: Long, src: String): Long = {
      val bp = epochsBp(src)
      bp / 10000 + (if (hash60("epoch:" + id) % 10000 < bp % 10000) 1L else 0L)
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = SparkEntry.queries("sample_epoch_repeat")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    // every doc appears exactly `copies` times with copy ids 0..k-1
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet === docs.map(_._1).toSet, "emission covers every doc (epochs >= 1)")
    docs.foreach { case (id, src) =>
      val k = copies(id, src)
      val rows = byDoc(id)
      assert(rows.length.toLong === k, s"doc $id copy count")
      assert(rows.map(_._5).sorted.toSeq === (0L until k).toSeq, s"doc $id copy ids dense")
      rows.foreach { case (_, s0, bp, n, _) =>
        assert(s0 === src && bp === epochsBp(src) && n === k, s"doc $id row fields")
      }
    }
    // per-source realized mass sits inside [floor, ceil] of epochs·n —
    // the fractional selection can never overshoot either bound
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val n = ds.length.toLong
      val total = ds.map(d => copies(d._1, d._2)).sum
      val bp = epochsBp(src).toLong
      assert(total >= (bp / 10000) * n && total <= ((bp + 9999) / 10000) * n,
        s"source $src mass $total outside the epoch band for n=$n")
    }
  }

  test("text_boilerplate_census: exact in-memory chunk-frequency recompute; doc-grain total") {
    // independent spelling: plain Scala sliding windows + MessageDigest
    // sha — not the query's HOF/conv strings
    def sha(s0: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunks(text: String): Seq[String] = {
      val tk = text.split(" ", -1).toSeq
      val starts = 0 to math.max(tk.length - 5, 0) by 4
      starts.map(st => tk.slice(st, st + 8).mkString(" ")).filter(_.nonEmpty)
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, t) => id -> chunks(t).map(sha) }.toMap
    val nDocsPerH = perDoc.toSeq.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = SparkEntry.queries("text_boilerplate_census")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet === docs.map(_._1).toSet, "doc-grain emission is total")
    got.foreach { case (id, nc, nb, share) =>
      val hs = perDoc(id)
      val enb = hs.count(h => nDocsPerH(h) >= 2).toLong
      assert(nc === hs.length.toLong, s"doc $id n_chunks")
      assert(nb === enb, s"doc $id n_boiler")
      val eshare = if (hs.nonEmpty) r6(enb.toDouble / hs.length.toDouble) else 0.0
      assert(share === eshare, s"doc $id share")
    }
    // duplicated docs (sf0.01+ fixtures plant exact doc dups) must read
    // fully boilerplate; at sf0.001 (no exact dups) the assertion is
    // vacuous — the exact recompute above is the real pin either way
    val dupIds = docs.groupBy(_._2).values.filter(_.length >= 2).flatten.map(_._1).toSet
    got.filter(r => dupIds.contains(r._1) && r._2 > 0).foreach { r =>
      assert(r._3 === r._2, s"exact-dup doc ${r._1} must be 100% boilerplate")
    }
  }

  test("sample_bootstrap_ci: Poisson thresholds, envelope, and unbiasedness") {
    // the threshold table IS the Poisson(1) CDF scaled to 2^60
    val e1 = math.exp(-1.0)
    def fact(k: Int) = (1 to k).product.toDouble
    queries.SampleQueries.poissonThresholds.zipWithIndex.foreach { case (t, k) =>
      val cdf = (0 to k).map(i => e1 / fact(i)).sum
      assert(t == math.floor(cdf * math.pow(2.0, 60)).toLong)
    }
    val out = SparkEntry.queries("sample_bootstrap_ci")(spark, sf).collect()
    assert(out.length == 8)
    val n = Tables.orders(spark, sf).count()
    val trueMean = Tables.orders(spark, sf)
      .agg(avg(org.apache.spark.sql.functions.col("o_totalprice"))).head.getDouble(0)
    val (lo, hi) = (out.head.getDouble(3), out.head.getDouble(4))
    out.foreach { r =>
      // E[n_eff] = n with sd ~ sqrt(n): allow 5 sigma
      assert(math.abs(r.getLong(1) - n) < 5 * math.sqrt(n.toDouble) + 5,
        s"replicate ${r.getLong(0)} effective size ${r.getLong(1)} vs $n")
      val m = r.getDouble(2)
      assert(m >= lo && m <= hi, "mean outside the emitted envelope")
      assert(r.getDouble(3) == lo && r.getDouble(4) == hi, "envelope not constant")
      // each replicate mean is a consistent estimator of the true mean
      assert(math.abs(m - trueMean) / trueMean < 0.2, s"replicate mean $m vs $trueMean")
    }
    assert(lo < hi, "replicates must differ (nondegenerate resampling)")
  }

  test("text_contamination_census reconciles exactly with the doc-grain leakage list") {
    import graft.queries.SampleQueries
    val census = SampleQueries.queries("text_contamination_census")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the doc-grain list + each doc's source — the census MUST be its rollup
    val docs = SampleQueries.queries("text_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val flaggedBySrc = docs.groupBy(srcOf).view.mapValues(_.size.toLong).toMap
    census.foreach { case (src, (nTrain, nFlagged, nHit)) =>
      assert(nFlagged === flaggedBySrc.getOrElse(src, 0L), s"$src n_flagged")
      assert(nFlagged <= nTrain, s"$src flagged can't exceed train mass")
      // a source with hits has flagged docs and vice versa
      assert((nHit > 0L) === (nFlagged > 0L), s"$src gram/doc consistency")
    }
    assert(census.values.map(_._2).sum === docs.size.toLong, "census totals = list size")
    // every source appears (clean sources as zero rows), none invented
    val allSrc = srcOf.values.toSet
    assert(census.keySet === allSrc, "one census row per source")
  }

  test("text_scrub_contaminated: in-memory mask recompute; reconciles with the leak list") {
    import graft.queries.SampleQueries
    def hash60(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def splitOf(id: Long): String = {
      val b = hash60("split:" + id) % 100
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    def sha(s0: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    def shingles(tk: Seq[String]): Seq[(Int, String)] =
      (1 to math.max(tk.length - 4, 0)).map(i => i -> tk.slice(i - 1, i + 4).mkString(" "))
        .filter(_._2.nonEmpty)
    val testSh = docs.filter(d => splitOf(d._1) == "test").flatMap(d => shingles(d._2))
      .map(_._2).toSet
    val expected = docs.filter(d => splitOf(d._1) == "train").flatMap { case (id, tk) =>
      val fl = shingles(tk).collect { case (i, sh) if testSh(sh) => i }
      if (fl.isEmpty) None
      else {
        def covered(j: Int) = fl.exists(i => j >= i && j <= i + 4)
        val kept = (1 to tk.length).filterNot(covered).map(j => tk(j - 1))
        Some(id -> (tk.length.toLong, fl.length.toLong,
          (1 to tk.length).count(covered).toLong, sha(kept.mkString(" "))))
      }
    }.toMap
    val rows = SampleQueries.queries("text_scrub_contaminated")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(rows === expected, "scrub must equal the in-memory mask recompute")
    // the scrubber's doc set IS the decontaminate list (shared frame)
    val listed = SampleQueries.queries("text_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.keySet === listed, "flagged docs must match the leak list")
    // masking really removes content wherever a hit exists
    rows.foreach { case (id, (nTok, nHits, nMasked, _)) =>
      assert(nHits >= 1L && nMasked >= 5L && nMasked <= nTok, s"doc $id mask bounds")
    }
  }

  test("chunkFrame short-doc boundary: <= 8 tokens emit ONE whole-text chunk; 9 is the first two-chunk doc (r14)") {
    // The r13 verdict's #5b: pin the intended boundary semantics so a
    // future size/stride change cannot silently re-chunk the corpus.
    // Planted docs straddle the boundary; expectations are written out
    // literally (no shared arithmetic with the chunker).
    import spark.implicits._
    val docs = Seq(
      (1L, "a"),                           // 1 token
      (2L, "a b c"),                       // 3 tokens
      (3L, "a b c d e f g h"),             // exactly 8 — still one chunk
      (4L, "a b c d e f g h i"),           // 9 — first doc with two chunks
      (5L, "a b c d e f g h i j k l")      // 12 — starts 0 and 4
    ).toDF("doc_id", "text")
    val got = graft.queries.SampleQueries.chunkFrameOf(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(got === Set(
      (1L, 0, "a"),
      (2L, 0, "a b c"),
      (3L, 0, "a b c d e f g h"),
      (4L, 0, "a b c d e f g h"), (4L, 1, "e f g h i"),
      (5L, 0, "a b c d e f g h"), (5L, 1, "e f g h i j k l")))
  }
}
