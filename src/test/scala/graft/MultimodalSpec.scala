package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.multimodal.Multimodal

/** BinaryType / multimodal capability (SURVEY §2.11): round-trip, hashing,
  * batched feature extraction, frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payloads round-trip through parquet with stable hashes") {
    val assets = Multimodal.syntheticAssets(spark, 60)
    val dir = java.nio.file.Files.createTempDirectory("graft_assets").toString
    assets.toDF().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType === BinaryType)
    val before = Multimodal.fingerprints(assets.toDF())
      .select("asset_id", "content_hash").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Multimodal.fingerprints(back)
      .select("asset_id", "content_hash").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before === after)
  }

  test("mm_binary_features matches an independent JVM byte-level recompute") {
    // the declared query's byte census / content hash / frame grid vs
    // MessageDigest + raw UTF-8 bytes computed with no Spark at all
    val out = SparkEntry.queries("mm_binary_features")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.length === docs.size)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    out.take(50).foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      assert(r.getLong(1) === bytes.length.toLong, "n_bytes")
      assert(r.getString(2) === md.digest(bytes).map("%02x".format(_)).mkString,
        "content_hash")
      assert(r.getString(3) ===
        bytes.take(4).map("%02X".format(_)).mkString, "magic_hex")
      assert(r.getLong(4) === (bytes.length + 255L) / 256L, "n_frames")
      // r8: empty payloads census 0 uniq frames (consistent with
      // n_frames = 0); non-empty stay within [1, n_frames]
      if (bytes.isEmpty)
        assert(r.getLong(5) === 0L, "n_uniq_frames empty payload")
      else
        assert(r.getLong(5) >= 1L && r.getLong(5) <= r.getLong(4),
          "n_uniq_frames bounds")
    }
  }

  test("mm_binary_roundtrip: landed BYTE_ARRAY reads back bit-exact vs a JVM recompute") {
    val out = SparkEntry.queries("mm_binary_roundtrip")(spark, sf).collect()
    assert(out.nonEmpty)
    // the landed file itself: BinaryType schema, payload bytes equal an
    // independent MessageDigest sha-chain recompute from doc_id alone
    val landed = spark.read.parquet(queries.ScanQueries.scratch("mm_binary", sf))
    assert(landed.schema("payload").dataType === BinaryType)
    val byId = landed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chainBytes(id: Long): Array[Byte] = {
      val hs = Iterator.iterate(sha(id.toString))(sha).take(5).toSeq
      val hex = hs.mkString.take(((id % 5) + 1).toInt * 64)
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    var sawHighByte = false
    out.take(50).foreach { r =>
      val id = r.getLong(0)
      val exp = chainBytes(id)
      assert(byId(id) === exp, s"doc $id payload bytes diverged through parquet")
      assert(r.getLong(1) === exp.length.toLong, "n_bytes")
      val hx = exp.map("%02X".format(_)).mkString
      assert(r.getString(2) === sha(hx), s"doc $id content_hash")
      if (exp.exists(b => b < 0 || b == 0)) sawHighByte = true
    }
    assert(sawHighByte, "payloads must exercise true non-UTF8 bytes")
  }

  test("feature extraction is deterministic, batched, fixed-dim") {
    val assets = Multimodal.syntheticAssets(spark, 60).repartition(4, col("asset_id"))
    val f1 = Multimodal.extractFeatures(assets, dim = 16).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(assets.repartition(7), dim = 16).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f1 === f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.length == 16))
    assert(f1.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("frame sampling explodes video assets only, bounded by duration") {
    val assets = Multimodal.syntheticAssets(spark, 30).toDF()
    val frames = Multimodal.sampleFrames(assets, everyMs = 500)
    val kinds = frames.join(assets, "asset_id").select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds === Set("video"))
    val bad = frames.join(assets, "asset_id")
      .where(col("frame_ms") > col("meta.durationMs")).count()
    assert(bad === 0)
  }

  test("resize rewrites the metadata struct, payload untouched") {
    val assets = Multimodal.syntheticAssets(spark, 10).toDF()
    val resized = Multimodal.resizeMeta(assets, 224, 224)
    assert(resized.select("meta.width").distinct().head.getInt(0) === 224)
    val pBefore = assets.select(sha2(col("payload"), 256)).collect().map(_.getString(0))
    val pAfter = resized.select(sha2(col("payload"), 256)).collect().map(_.getString(0))
    assert(pBefore.sameElements(pAfter))
  }

  test("mm_frame_sample: stride, offsets, and fingerprints match a MessageDigest recompute") {
    val rows = SparkEntry.queries("mm_frame_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getString(5)))
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.map(_._1).distinct.length.toLong ===
      graft.Tables.documents(spark, sf).count(),
      "every document contributes at least frame 0")
    rows.groupBy(_._1).foreach { case (docId, g) =>
      // independent payload recompute: the same chained sha256 hex
      var h = sha(docId.toString)
      val sb = new StringBuilder(h)
      for (_ <- 2 to 5) { h = sha(h); sb.append(h) }
      val nBytes = (docId % 5 + 1) * 32
      val hx = sb.substring(0, (nBytes * 2).toInt).toUpperCase
      val nFrames = ((nBytes + 31) / 32).toInt
      assert(g.map(_._4).sorted.toSeq === (0 until nFrames by 2),
        s"doc $docId must sample every 2nd frame")
      g.foreach { case (_, nb, nf, fi, off, fh) =>
        assert(nb === nBytes && nf === nFrames && off === fi.toLong * 32L)
        val slice = hx.substring(fi * 64, math.min(fi * 64 + 64, hx.length))
        assert(fh === sha(slice), s"frame $fi of doc $docId")
      }
    }
  }

  test("mm_shard_manifest: shards partition each source's assets under the fill-then-cut rule") {
    // independent JVM recompute of the packing: per source, doc_id
    // order, exclusive byte prefix sum, shard = cum_before / 1024 —
    // the manifest must be exactly the per-shard rollup of that walk.
    val assets = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map { r =>
        val id = r.getLong(0)
        (r.getString(1), id, (id % 5 + 1) * 32)   // payload bytes by construction
      }
    val walk = assets.groupBy(_._1).toSeq.flatMap { case (src, as) =>
      var cum = 0L
      as.sortBy(_._2).toSeq.map { case (_, id, nb) =>
        val shard = cum / 1024L; cum += nb; (src, shard, id, nb)
      }
    }
    val expected = walk.groupBy(w => (w._1, w._2)).map { case ((src, sh), ws) =>
      (src, sh) -> (ws.size.toLong, ws.map(_._4).sum, ws.map(_._3).min, ws.map(_._3).max)
    }
    val out = SparkEntry.queries("mm_shard_manifest")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out === expected, "manifest must equal the reference packing walk")
    // every shard respects the budget modulo its last asset (fill-then-cut:
    // bytes-before-last < budget), shard seqs are contiguous from 0
    expected.foreach { case ((src, sh), (n, bytes, _, lastDoc)) =>
      val lastBytes = (lastDoc % 5 + 1) * 32
      assert(bytes - lastBytes < 1024L, s"shard ($src, $sh) overfilled before its last asset")
    }
    expected.keys.groupBy(_._1).foreach { case (src, ks) =>
      val seqs = ks.map(_._2).toSeq.sorted
      assert(seqs === (0L until seqs.length).toSeq, s"$src shard seqs must be contiguous")
    }
  }

  test("mm_near_dup_phash: pair set equals a JVM fingerprint/band/verify recompute") {
    // independent spelling: MessageDigest sha chain, explicit byte math,
    // plain nested-loop DCT over an INDEPENDENTLY derived coefficient
    // table (exact-BigDecimal floor(x+1/2) — half-toward-+inf like the
    // query's floor(x·1e6+0.5); the r12 ADVICE fix: the old HALF_UP
    // rounds negative exact halves AWAY from zero, agreeing with the
    // query only because no c·cos value lands on a .5 millionth — a
    // derivation change could have tripped the pin for a
    // rounding-convention reason. r13 ADVICE accuracy note: this is
    // still NOT a literal twin — the query adds 0.5 in DOUBLE
    // arithmetic, where the add can round across an integer boundary
    // that the exact BigDecimal sum does not (the r7 ROUND lesson's
    // residual case); kept deliberately as the INDEPENDENT derivation,
    // because the table-equality assert below fails LOUDLY at any such
    // representational boundary rather than silently following the
    // query's spelling), explicit band agreement — not the query's
    // conv/HOF strings
    def sha(s0: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tRef: Array[Long] = {
      val a = Array.ofDim[Long](64)
      for (u <- 0 until 8; x <- 0 until 8) {
        val c = if (u == 0) 1.0 / math.sqrt(8.0) else math.sqrt(2.0) / math.sqrt(8.0)
        a(u * 8 + x) =
          (BigDecimal(c * math.cos(math.Pi * (2 * x + 1) * u / 16.0) * 1e6) +
            BigDecimal("0.5")).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      }
      a
    }
    // the shared table IS this table (pins graft.queries.MmQueries.dctT)
    assert(graft.queries.MmQueries.dctT.toSeq === tRef.toSeq)
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val bits = ids.map { id =>
      val hx = (sha((id / 8).toString) + sha(sha((id / 8).toString))).toUpperCase
      val p = ((id % 8) * 8).toInt
      val bt = (0 until 64).map { k =>
        val b = Integer.parseInt(hx.substring(k * 2, k * 2 + 2), 16)
        if (k == p) b ^ 1 else b
      }
      // 2-D DCT-II as two explicit loop passes, all Long arithmetic
      val md = Array.ofDim[Long](64)
      for (u <- 0 until 8; y <- 0 until 8)
        md(u * 8 + y) = (0 until 8).map(x => tRef(u * 8 + x) * bt(x * 8 + y)).sum
      val dct = Array.ofDim[Long](64)
      for (u <- 0 until 8; v <- 0 until 8)
        dct(u * 8 + v) = (0 until 8).map(y => md(u * 8 + y) * tRef(v * 8 + y)).sum
      val sac = dct.drop(1).sum
      id -> dct.map(c => if (63 * c > sac) 1 else 0)
    }.toMap
    def bandVals(bs: Array[Int]): Seq[Int] =
      (0 until 4).map(j => (0 until 16).map(i => bs(j * 16 + i) << i).sum)
    val expected = (for {
      a <- ids; b <- ids if a < b
      if bandVals(bits(a)).zip(bandVals(bits(b))).exists { case (x, y) => x == y }
      ham = bits(a).zip(bits(b)).map { case (x, y) => math.abs(x - y) }.sum
      if ham <= 8
    } yield (a, b, ham.toLong)).toSet
    val got = SparkEntry.queries("mm_near_dup_phash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected, "banded+verified pair set diverges from the reference")
    // the planted variant structure: every same-family pair survives
    // (DCT linearity: a one-pixel ±1 tweak shifts each coefficient by
    // at most one T·T product — tiny against typical |C|, so family
    // Hamming stays 0-2)
    val fams = ids.groupBy(_ / 8).values.filter(_.length > 1)
    fams.foreach(f => for (a <- f; b <- f if a < b)
      assert(got.exists(t => t._1 == a && t._2 == b), s"family pair ($a,$b) missing"))
    // and near-dup pairs are overwhelmingly intra-family (random 64-bit
    // signatures sit near Hamming 32, far above the 8 threshold)
    val cross = got.count(t => t._1 / 8 != t._2 / 8)
    assert(cross <= got.size / 10, s"cross-family pairs should be rare, got $cross/${got.size}")
  }

  test("mm_dedup_binary: census equals an in-memory normalized-content grouping") {
    // independent reference: group docs per source by the SAME content
    // normalization rule (lowercase, strip non-[a-z0-9 ]) with no Spark
    // and no hashing at all — payload equality must coincide with
    // content equality (the payload is a function of the content hash).
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.replaceAll("[^a-z0-9 ]", "")))
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val groups = ds.groupBy(_._3)
      src -> (ds.length.toLong, groups.size.toLong,
        (ds.length - groups.size).toLong,
        groups.values.map(_.length.toLong).max,
        groups.values.map(_.map(_._1).min).min)
    }
    val out = SparkEntry.queries("mm_dedup_binary")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out === expected, "census must match the content-grouping reference")
    // r6g fact: sf0.001 documents carry NO exact dups — the census must
    // degenerate to all-unique here (this is the assertion, not a gap)
    assert(out.values.forall(v => v._3 == 0L && v._4 == 1L),
      "sf0.001 must census all-unique")
  }
}
