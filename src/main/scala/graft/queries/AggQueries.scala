package graft.queries

import graft.Tables
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Qutil._

/** Buffer for the geometric-mean UDAF: running sum of logs + count. */
case class GeoBuf(sumLog: Double, n: Long)

/** Typed UDAF (SURVEY §2.4 agg_udaf_geomean): geometric mean via
  * exp(mean(ln x)). Partial aggregation (reduce) runs map-side, merge
  * combines partials — the same partial+final shape as built-in aggregates,
  * so it scales like sum()/avg() at 100 TB. */
object GeoMeanAgg extends Aggregator[Double, GeoBuf, Double] {
  override def zero: GeoBuf = GeoBuf(0.0, 0L)
  override def reduce(b: GeoBuf, x: Double): GeoBuf =
    if (x > 0.0) GeoBuf(b.sumLog + math.log(x), b.n + 1) else b
  override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
    GeoBuf(a.sumLog + b.sumLog, a.n + b.n)
  override def finish(b: GeoBuf): Double =
    if (b.n == 0) 0.0 else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SURVEY §2.4 — aggregations. Hash aggregation with map-side partials is
  * the backbone of every reporting load the reference runs
  * (/root/reference/README.md:3,9). */
object AggQueries {

  /** Winsorized-mean emissions (agg_winsorized_mean) — shared verbatim
    * by query and oracle (defs: oracle Map init-order rule). Money
    * display via the DERIVED-money cents×DECIMAL'0.01' rule; means via
    * the averages rule (exact decimal sum → one double cast → one fixed
    * division chain → ROUND 6). */
  private def centsMoneyF(c: String): String =
    s"CAST(CAST($c AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DOUBLE)"
  private def wmeanF(sc: String): String =
    s"((CASE WHEN isnan((CAST($sc AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0)) OR abs((CAST($sc AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0)) >= 9e12 THEN CAST((CAST($sc AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0) AS DOUBLE) ELSE CAST(floor((CAST($sc AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0) * 1e6 + 0.5) AS DOUBLE) / 1e6 END))"

  /** Revenue-share emission (agg_pareto, agg_topk_other) over the exact
    * integer mass column and the exact total `tc` — one division,
    * shared verbatim (def: oracle Map init-order rule). */
  private def shareF(c: String): String =
    s"((CASE WHEN isnan((CAST($c AS DOUBLE) / CAST(tc AS DOUBLE))) OR abs((CAST($c AS DOUBLE) / CAST(tc AS DOUBLE))) >= 9e12 THEN CAST((CAST($c AS DOUBLE) / CAST(tc AS DOUBLE)) AS DOUBLE) ELSE CAST(floor((CAST($c AS DOUBLE) / CAST(tc AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END))"

  /** Gini emission formulas off the exact moment sums (n, sx, sxr) —
    * shared verbatim by query and oracle; each DECIMAL(38,0)/HUGEINT sum
    * casts to DOUBLE exactly once (the agg_skew_kurt rule: the cast is
    * correctly rounded on both engines even past 2^53). */
  /** Theil shared strings (defs, init-order rule) — parse in BOTH
    * dialects: μ_g off the exact group sums, share off the exact
    * totals, per-order term (x/μ_g)·ln(x/μ_g) with a nonpositive guard
    * (order cents are positive on TPC-H data; the guard keeps the
    * formula total). */
  private def theilMuFormula: String =
    "CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)"
  private def theilShareFormula: String =
    "CAST(sg AS DOUBLE) / CAST(st AS DOUBLE)"
  private def theilTermFormula: String =
    s"(CASE WHEN cents <= 0 THEN CAST(0 AS DOUBLE) ELSE " +
      s"(CAST(cents AS DOUBLE) / ($theilMuFormula)) * " +
      s"ln(CAST(cents AS DOUBLE) / ($theilMuFormula)) END)"

  /** r13 (the r12 verdict #3 / r11 ADVICE #4 close): the per-nation term
    * sum was the catalog's last hash-matched nondeterministic-parity
    * surface — a plain SUM of libm-ln doubles in partition order. The
    * fix quantizes each term to an exact pico-unit integer
    * (floor(t·1e12 + 0.5) — parses identically in both dialects: Spark
    * floor(double)→BIGINT, DuckDB floor→integral double; |t| ≤ ~30 so
    * t·1e12 ≤ 3e13, exact in both) and sums in DECIMAL(38,0)/HUGEINT —
    * ORDER-FREE, so Spark is deterministic run-to-run and the
    * cross-engine diff collapses from sum-reassociation drift to a few
    * ±1 pico-units at ln-ulp quantization boundaries (≤1e-9 on the sum,
    * vs the r3 grid's 5e-4 — six orders of headroom). Chosen over the
    * suggested collect_list+array_sort keyed fold DELIBERATELY: that
    * shape would be the catalog's only corpus-sized per-group array
    * (nation groups are corpus-scale), while this keeps the map-side
    * partial-aggregable plan at 100 TB. Quantization error on
    * t_within = tsumq/1e12/ng is ≤ 0.5e-12 — invisible at r3. */
  private def theilTermQ: String =
    s"CAST(floor(($theilTermFormula) * 1e12 + 0.5) AS DECIMAL(38,0))"
  private def theilTwFormula: String =
    "(CAST(tsumq AS DOUBLE) / 1e12) / CAST(ng AS DOUBLE)"

  /** HHI / effective-N emissions off the exact DECIMAL(38,0)/HUGEINT
    * sums (r12): one correctly-rounded cast per operand, fixed op order,
    * round 6; zero denominators guarded by integer predicates. */
  private def hhiF: String = {
    val e = "CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))"
    s"CASE WHEN tot > 0 THEN ${Qutil.r6Sql(e)} END"
  }
  private def effNF: String = {
    val e = "(CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) / CAST(ssq AS DOUBLE)"
    s"CASE WHEN ssq > 0 THEN ${Qutil.r6Sql(e)} END"
  }

  private def giniSql: String =
    "((CASE WHEN isnan(((2.0 * CAST(sxr AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)))) OR abs(((2.0 * CAST(sxr AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)))) >= 9e12 THEN CAST(((2.0 * CAST(sxr AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))) AS DOUBLE) ELSE CAST(floor(((2.0 * CAST(sxr AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))) * 1e6 + 0.5) AS DOUBLE) / 1e6 END))"

  val queries: Map[String, Q] = Map(
    // Theil-T inequality with within/between decomposition (r11) — the
    // DECOMPOSABLE inequality gauge next to agg_gini (gini ranks, Theil
    // splits: how much order-value concentration lives INSIDE nations
    // vs BETWEEN them — the additive property gini lacks). Exact
    // machinery: per-nation (n_g, Σcents) as DECIMAL(38,0)/HUGEINT
    // sums; every mean is one fixed-order division off exact integers;
    // per-order terms (x/μ_g)·ln(x/μ_g) quantize to pico-unit integers
    // and sum order-free in DECIMAL(38,0)/HUGEINT (r13 — see theilTermQ;
    // emissions stay round 3, the geomean rule), the between/total
    // folds run nation-ascending over the BOUNDED group frame
    // (collect_list+sort == list ORDER BY — the r6b pair). Scale
    // shape: one join-annotated
    // scan for the terms (group frame broadcast), one keyed term
    // rollup; the 25-row group frame checkpoints once (multi-consumer);
    // scalar t_between/t_total ride one bounded crossJoin back.
    // PropertySpec pins the decomposition identity T = Σ s_g·T_g + T_b
    // against an independent recompute.
    // Herfindahl–Hirschman concentration index (r12) — the THIRD member
    // of the concentration family (gini: global inequality; pareto:
    // decile shares; theil: within/between decomposition; HHI: the
    // antitrust-standard per-market index Σ share², plus its reciprocal
    // — the "effective number of customers" — the gauge a curation
    // pipeline reads as "how many independent contributors does this
    // source really have"). EXACT integers to the last step: per-customer
    // revenue in cents (BIGINT), Σcents and Σcents² in DECIMAL(38,0)
    // (HUGEINT mirror — the skew_kurt rule; cents² ≤ ~1e22 at any
    // realistic scale), then ONE shared formula each: hhi = ssq/tot²,
    // eff_n = tot²/ssq — fixed-order correctly-rounded casts, round 6,
    // zero-guards on integer predicates. Scale shape: two-level keyed
    // aggregate (customer grain partial-combines map-side, nation grain
    // bounded), one broadcast-able dim join, no window.
    "agg_hhi" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .selectExpr("o_custkey",
          "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents")
        .groupBy("o_custkey").agg(sum(col("cents")).as("cc"))
      cust.join(broadcast(Tables.customer(s, d)
          .selectExpr("c_custkey AS o_custkey", "c_nationkey")), "o_custkey")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          sum(expr("CAST(cc AS DECIMAL(38,0))")).as("tot"),
          sum(expr("CAST(cc AS DECIMAL(38,0)) * cc")).as("ssq"))
        .selectExpr("c_nationkey", "n_customers",
          s"$hhiF AS hhi", s"$effNF AS effective_n")
        .orderBy("c_nationkey")
    }),

    "agg_theil" -> ((s, d) => {
      // the narrow (nk, cents) frame feeds the group aggregate AND the
      // term scan — checkpoint or the orders⋈customer join runs twice
      val x = Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .selectExpr("c_nationkey AS nk",
          "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents")
        .transform(graft.operators.Scale.materialize)
      // the bounded 25-row group frame has THREE consumers (totals, the
      // term join, the per-nation join) — checkpoint or its aggregate
      // over x re-runs per consumer (the chi2 multi-consumer rule)
      val g = x.groupBy("nk").agg(count(lit(1)).as("ng"),
          sum(col("cents").cast(DecimalType(38, 0))).as("sg"))
        .transform(graft.operators.Scale.materialize)
      val tot = g.agg(sum("ng").as("n"),
        sum(col("sg").cast(DecimalType(38, 0))).as("st"))
      val tw = x.join(broadcast(g), "nk")
        .selectExpr("nk", s"$theilTermQ AS termq")
        .groupBy("nk").agg(sum("termq").as("tsumq"))
      val per = g.join(tw, "nk").crossJoin(broadcast(tot))
        .selectExpr("nk", "ng", "sg", "n", "st",
          s"$theilTwFormula AS t_w_raw",
          s"$theilShareFormula AS share_raw",
          s"$theilMuFormula AS mug_raw")
        .selectExpr("nk", "ng", "share_raw", "mug_raw", "t_w_raw",
          s"share_raw * ln(mug_raw / (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))) AS tb_term",
          "share_raw * t_w_raw AS tt_term")
        .transform(graft.operators.Scale.materialize)
      val scal = per.agg(
        expr("aggregate(transform(array_sort(collect_list(struct(nk, tb_term))), " +
          "x -> x.tb_term), CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("t_between_raw"),
        expr("aggregate(transform(array_sort(collect_list(struct(nk, tt_term))), " +
          "x -> x.tt_term), CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("t_in_raw"))
      per.crossJoin(broadcast(scal))
        .selectExpr("nk AS nationkey", "ng AS n_orders",
          s"${r6Sql("share_raw")} AS share",
          s"${r6Sql("mug_raw / 100.0")} AS mean_price",
          s"${r3Sql("t_w_raw")} AS t_within",
          s"${r3Sql("t_between_raw")} AS t_between",
          s"${r3Sql("t_between_raw + t_in_raw")} AS t_total")
        .orderBy("nationkey")
    }),

    // Gini concentration of order value (r6f) — the inequality gauge a
    // migration/curation pipeline runs to answer "is the value massed in
    // a few records?" (0 = uniform, ->1 = one record is everything).
    // Exact rank formulation: gini = (2*Σ rank*x - (n+1)*Σx) / (n*Σx)
    // over ascending values — ranks come from Scale.globalRank's
    // distributed two-pass form (range repartition + local ranks +
    // driver prefix-sum of the bounded per-partition counts; NO
    // single-partition window over the table), values are exact integer
    // cents, and both moment sums are DECIMAL(38,0) (order-free). The
    // only FP is the shared-formula emission. Rank ties cannot occur:
    // the order key (cents, orderkey) is unique.
    "agg_gini" -> ((s, d) => {
      val v = Tables.orders(s, d).selectExpr(
        "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents",
        "o_orderkey AS k")
      graft.operators.Scale.globalRank(v, 8, "rnk", "nn", col("cents"), col("k"))
        .agg(max(col("nn")).as("n"),
          sum(col("cents").cast(DecimalType(38, 0))).as("sx"),
          sum((col("rnk") * col("cents")).cast(DecimalType(38, 0))).as("sxr"))
        .selectExpr("n", "CAST(sx AS DOUBLE) / 100.0 AS total_price",
          s"$giniSql AS gini")
    }),

    // Pareto concentration curve (r6g) — "what share of revenue do the
    // top X% of customers carry": per-customer exact-cents revenue,
    // global DESCENDING rank via Scale.globalRank on the unique
    // (-cents, cust) order (distributed two-pass, no single-partition
    // window), decile = ((rnk−1)·10) DIV n, then per-decile mass and
    // cumulative share via the bounded 10-row grid self-join (the
    // dq_ks_drift CDF shape — the grid descends from a checkpointed
    // LogicalRDD, so the non-equi join carries the explicit broadcast
    // hint per the r6f rule). The decile-grain sibling of agg_gini
    // (gini compresses concentration to one number; this shows the
    // curve a pricing/abuse review actually reads).
    "agg_pareto" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("cust"))
        .agg(sum(expr("CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))")).as("sc"))
        .selectExpr("cust", "CAST(sc AS BIGINT) AS cents", "-CAST(sc AS BIGINT) AS negc")
      val ranked = graft.operators.Scale.globalRank(rev, 8, "rnk", "nn",
        col("negc"), col("cust"))
      val per = ranked
        .selectExpr("CAST(((rnk - 1) * 10) DIV nn AS INT) AS decile", "cents")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"))
      val tot = per.agg(sum("cents").as("tc"))
      per.as("a").join(broadcast(per.as("b")), col("b.decile") <= col("a.decile"))
        .groupBy(col("a.decile").as("decile"), col("a.n_customers").as("n_customers"),
          col("a.cents").as("cents"))
        .agg(sum(col("b.cents")).as("cum_cents"))
        .crossJoin(broadcast(tot))
        .selectExpr("decile", "n_customers", "cents", "cum_cents",
          s"${shareF("cum_cents")} AS cum_share")
        .orderBy("decile")
    }),

    // Top-N + OTHER rollup (r6g) — the report emission every revenue
    // dashboard renders: the 10 largest customers by exact-cents
    // revenue, each with its share, plus ONE aggregated OTHER row so
    // the rows always total 100%. Customer revenue is one keyed
    // aggregate (checkpointed once for its three consumers); top-10 is
    // a TakeOrderedAndProject (never a global window); the remainder is
    // a broadcast anti-join + one scalar aggregate.
    "agg_topk_other" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("cust"))
        .agg(sum(expr("CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))")).as("sc"))
        .selectExpr("cust", "CAST(sc AS BIGINT) AS cents")
        .transform(graft.operators.Scale.materialize)
      val top = rev.orderBy(col("cents").desc, col("cust")).limit(10)
      val oth = rev.join(broadcast(top.select("cust")), Seq("cust"), "left_anti")
        .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"))
        .selectExpr("'OTHER' AS label", "n_customers", "cents")
      val tot = rev.agg(sum("cents").as("tc"))
      top.selectExpr("CAST(cust AS STRING) AS label", "CAST(1 AS BIGINT) AS n_customers", "cents")
        .union(oth)
        .crossJoin(broadcast(tot))
        .selectExpr("label", "n_customers", "cents", s"${shareF("cents")} AS share")
        .orderBy("label")
    }),

    // Flagship (SparkEntry.entry): TPC-H-Q1-style pricing summary.
    "agg_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumDec2(col("l_quantity")).as("sum_qty"),
          sumDec2(col("l_extendedprice")).as("sum_base_price"),
          sumMoneyD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          sumMoneyD(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          avgDec2(col("l_quantity")).as("avg_qty"),
          avgDec2(col("l_extendedprice")).as("avg_price"),
          avgDec6(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Exact distinct: expand + two-phase aggregation.
    "agg_distinct_exact" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"))
        .orderBy("l_returnflag")),

    // Bitmap-rollup EXACT distinct (r6e) — the THIRD distinct strategy
    // next to countDistinct (exact, expand-cost) and HLL (approximate):
    // pack ids into per-bucket 64-bit bitmaps (bucket = id DIV 64, one
    // bit per id), bit_or them per (group, bucket), then sum popcounts.
    // Both aggregates are partial-aggregable integer folds (bit_or is
    // commutative/associative — map-side combine collapses each bucket
    // to ONE long before the shuffle), which is exactly the
    // Roaring-bitmap rollup pattern OLAP stores use: landed bitmap
    // segments merge with OR at ANY grain, so exact distincts roll up
    // without ever re-touching raw ids. PropertySpec pins equality
    // with countDistinct; the oracle replays the identical bit math.
    "agg_bitmap_distinct" -> ((s, d) =>
      // 63 bits per bucket, not 64: DuckDB rejects 1 << 63 as a signed
      // overflow (Spark would wrap to the sign bit) — keeping the mask
      // positive makes the bit math portable with no CASE for bit 63
      Tables.orders(s, d)
        .selectExpr("o_orderpriority", "o_custkey DIV 63 AS bucket",
          "shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % 63 AS INT)) AS m1")
        .groupBy("o_orderpriority", "bucket")
        .agg(expr("bit_or(m1)").as("m"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_buckets"),
          sum(expr("bit_count(m)")).as("n_distinct"))
        .orderBy("o_orderpriority")),

    // HLL sketch distinct — the 100 TB answer to countDistinct's expand cost.
    // No oracle (approximate); unit test asserts ±2% of exact.
    "agg_distinct_approx" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_part"))
        .orderBy("l_returnflag")),

    // ROLLUP with subtotals + grand total, grouping_id disambiguates levels.
    "agg_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping_id().cast(IntegerType).as("gid"),
          sumDec2(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .select("r_name", "n_name", "gid", "revenue", "n_orders")
        .orderBy(col("gid"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)),

    // CUBE over two low-cardinality dims.
    "agg_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast(IntegerType).as("gid"), count(lit(1)).as("cnt"))
        .select("o_orderstatus", "o_orderpriority", "gid", "cnt")
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Explicit GROUPING SETS via the SQL entry point (SURVEY §3.2 EP2).
    "agg_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, CAST(grouping_id() AS INT) AS gid, COUNT(*) AS cnt
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    }),

    // Post-aggregation filter (HAVING).
    "agg_having" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(avgDec2(col("c_acctbal")).as("avg_bal"), count(lit(1)).as("n_cust"))
        .where(col("avg_bal") > 4000.0)
        .orderBy("c_mktsegment")),

    // DQ profiling stats: min/max/stddev/median per event type.
    "agg_stats" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          r6(stddev_samp(col("value"))).as("std_v"),
          r6(expr("percentile(value, 0.5)")).as("med_v"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // Argument-extrema aggregates (r3): median + min_by/max_by — "which
    // order had the extreme price", the lookup that otherwise costs a
    // self-join back to the row. min_by/max_by are deterministic HERE
    // because the per-group price extremes are unique in the fixtures
    // (verified at all three SFs); with ties you'd use the min(struct)
    // tie-break pattern (sim_join_label) instead.
    "agg_extrema" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r6(median(col("l_extendedprice"))).as("med_price"),
          min_by(col("l_orderkey"), col("l_extendedprice")).as("cheapest_order"),
          max_by(col("l_orderkey"), col("l_extendedprice")).as("dearest_order"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy("l_returnflag")),

    // Approximate quantiles (Greenwald-Khanna sketch) — the mergeable
    // 100 TB path for agg_stats' exact percentile, as HLL is for
    // countDistinct. Deterministic for fixed input, but sketch bounds are
    // engine-specific, so no oracle; ApproxSpec bounds it vs exact.
    // Emitted as three scalar columns, not one ARRAY column: the driver
    // lexsorts the output frame and ndarray cells crash that sort
    // (round-1 VERDICT.md defect #2).
    "agg_quantiles_approx" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("approx_percentile(value, array(0.25, 0.5, 0.75), 1000)").as("qs"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          element_at(col("qs"), 1).as("q25"),
          element_at(col("qs"), 2).as("q50"),
          element_at(col("qs"), 3).as("q75"),
          col("n"))
        .orderBy("event_type")),

    // Bivariate statistics (df.stat family): Pearson correlation and
    // sample covariance per group.
    "agg_corr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
          r6(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("covar_qty_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Quantity-weighted average price — the exact-decimal discipline
    // applied to a RATIO of sums: numerator sum(dec2(p)*dec2(q)) and
    // denominator sum(dec2(q)) are both exact decimals (order-independent
    // partials at any scale); ONE double division + round(6) at emission,
    // mirrored op-for-op in the oracle. A single partial+final aggregate
    // pass — never avg(p*q) over doubles (sum-order drift).
    "agg_weighted_avg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r6(sum(dec2(col("l_extendedprice")) * dec2(col("l_quantity")))
            .cast(DoubleType) / sum(dec2(col("l_quantity"))).cast(DoubleType))
            .as("wavg_price"),
          sumDec2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Per-group mode (most frequent value) — two-stage: count per
    // (group, value) then min(struct(-cnt, value)) per group, so the
    // argmax runs as an AGGREGATE with map-side partials (never a window
    // over the counted table) and ties break deterministically to the
    // lexicographically smallest value. Same min-struct pattern as
    // sim_join_label; both stages distribute at any scale.
    "agg_mode" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("o_orderstatus")
        .agg(min(struct((-col("cnt")).as("nc"), col("o_orderpriority").as("p"))).as("m"),
          sum(col("cnt")).as("n_orders"))
        .select(col("o_orderstatus"), col("m.p").as("mode_priority"),
          (-col("m.nc")).as("mode_cnt"), col("n_orders"))
        .orderBy("o_orderstatus")),

    // Fixed-width value histogram — the DQ-profiling aggregate behind every
    // distribution dashboard. Bucketing is EXACT across engines: the
    // moneyD cents trick (floor(x*100+0.5), the one shared derived-money
    // rounding) then INTEGER division by the cents width — never a double
    // divide whose boundary cell could differ between engines. Output is
    // bounded (|price range| / width buckets); the fraction is one IEEE
    // division off exact longs, round 6. Map-side partial agg, one shuffle
    // on the bucket id.
    "agg_histogram" -> ((s, d) => {
      val buckets = Tables.orders(s, d)
        .select(expr(
          "CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) DIV 5000000 AS INT)")
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val total = buckets.agg(sum(col("n")).as("tot"))
      buckets.crossJoin(broadcast(total))
        .select(col("bucket"), (col("bucket") * 50000L).as("lo_dollars"),
          col("n"), r6(col("n").cast("double") / col("tot").cast("double")).as("frac"))
        .orderBy("bucket")
    }),

    // Exact per-group DISCRETE percentiles (p50/p90/p99) of order totals.
    // Engine built-ins disagree across engines (Spark percentile()
    // interpolates, DuckDB quantile_disc rounds positions differently), so
    // the selection rule is defined once, in integers, on both sides:
    // the element at 1-based position floor((n-1)*p)+1 of the
    // (cents, o_orderkey)-sorted group — exact money cents, integer DIV,
    // unique ordering. The rank window is PARTITIONED by the group (never
    // a global sort; scales per-group) and the final pick is a conditional
    // MAX aggregate with map-side partials.
    "agg_percentile_disc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("grp").orderBy(col("cents"), col("o_orderkey"))
      val b = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"),
          col("o_orderkey"))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      def pick(num: Int, den: Int) =
        max(when(col("rn") === expr(s"((n - 1) * $num) DIV $den + 1"), col("cents")))
      def money(c: org.apache.spark.sql.Column) =
        (c.cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.01"))).cast(DoubleType)
      b.groupBy("grp")
        .agg(money(pick(1, 2)).as("p50"), money(pick(9, 10)).as("p90"),
          money(pick(99, 100)).as("p99"), count(lit(1)).as("n_orders"))
        .orderBy("grp")
    }),

    // Winsorized mean (r6g) — the robust-mean companion to
    // agg_percentile_disc: clamp each order's cents to the group's exact
    // discrete [p05, p95] (the SAME integer rank-selection rule — both
    // engines pick position ((n-1)*p) DIV 20 + 1 of the (cents, key)
    // order, no interpolation convention to drift), then average the
    // clamped exact cents. Outlier-robust aggregation is what you
    // publish when a feed's tails are dirty (dq_anomaly_* finds the bad
    // rows; this reports a mean that survives them). Means follow the
    // averages rule: DECIMAL(38,0) cent sums, CAST DOUBLE, one fixed
    // division chain, ROUND 6. One keyed window + one broadcast join of
    // the bounded percentile frame + one partial-aggregable groupBy.
    "agg_winsorized_mean" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("grp").orderBy(col("cents"), col("o_orderkey"))
      val b = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"),
          col("o_orderkey"))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      val pct = b.groupBy("grp").agg(
        max(when(col("rn") === expr("((n - 1) * 1) DIV 20 + 1"), col("cents"))).as("p05c"),
        max(when(col("rn") === expr("((n - 1) * 19) DIV 20 + 1"), col("cents"))).as("p95c"))
      b.join(broadcast(pct), "grp")
        .selectExpr("grp", "cents", "p05c", "p95c",
          "CASE WHEN cents < p05c THEN p05c WHEN cents > p95c THEN p95c ELSE cents END AS wc")
        .groupBy("grp")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sr"),
          sum(expr("CAST(wc AS DECIMAL(38,0))")).as("sw"),
          max("p05c").as("p05c"), max("p95c").as("p95c"))
        .selectExpr("grp", "n_orders", s"${centsMoneyF("p05c")} AS p05",
          s"${centsMoneyF("p95c")} AS p95",
          s"${wmeanF("sr")} AS mean_raw", s"${wmeanF("sw")} AS mean_winsorized")
        .orderBy("grp")
    }),

    // Ordered LISTAGG per group — the reconciliation-report surface
    // (one line per region listing its members). collect_list is
    // order-nondeterministic under parallel merge, so the sort happens
    // INSIDE the row (array_sort before concat) — deterministic on any
    // partitioning; group payload is bounded (nations per region), which
    // is the contract that makes listagg safe at scale at all.
    "agg_string_concat" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")),

    // Higher-moment distribution shape (skewness + excess kurtosis) per
    // group — the dq_anomaly_zscore exactness pattern pushed to the 3rd
    // and 4th moment: raw moments are EXACT integer sums of cents powers
    // (DECIMAL(38,0) here, HUGEINT in DuckDB — c^4 reaches ~6e33, far past
    // BIGINT), each cast once to double (both engines round to the same
    // nearest double), then ONE shared fixed-order IEEE formula string
    // (skewKurtFormulas — spliced verbatim into the oracle, so the op
    // order CANNOT drift) with sqrt instead of pow (sqrt is correctly
    // rounded; libm pow is not). Map-side partial sums; bounded output.
    "agg_skew_kurt" -> ((s, d) => {
      val cd = expr("CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))")
      val (skewF, kurtF) = skewKurtFormulas
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n_items"),
          sum(cd).as("s1"), sum(cd * cd).as("s2"),
          sum(cd * cd * cd).as("s3"), sum(cd * cd * cd * cd).as("s4"))
        .selectExpr("grp", "n_items",
          "CAST(n_items AS DOUBLE) AS n", "CAST(s1 AS DOUBLE) AS m1",
          "CAST(s2 AS DOUBLE) AS m2", "CAST(s3 AS DOUBLE) AS m3",
          "CAST(s4 AS DOUBLE) AS m4")
        .selectExpr("grp", "n_items", s"$skewF AS skewness", s"$kurtF AS kurtosis")
        .orderBy("grp")
    }),

    // Jarque–Bera normality TEST (r6g) — agg_skew_kurt measures shape,
    // this DECIDES: JB = n/6·(S² + K²/4) against the χ²(2) 5% critical
    // value (5.99). Deliberately shares the exact-integer moment frame
    // and the UNROUNDED skew/kurt strings (skewKurtRaw — squaring the
    // rounded display values would corrupt the statistic), so the
    // descriptive and decision queries can never disagree about the
    // distribution. Same map-side partial moments, bounded output; the
    // verdict is a comparison of the shared rounded statistic on both
    // engines.
    "agg_jarque_bera" -> ((s, d) => {
      val cd = expr("CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))")
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n_items"),
          sum(cd).as("s1"), sum(cd * cd).as("s2"),
          sum(cd * cd * cd).as("s3"), sum(cd * cd * cd * cd).as("s4"))
        .selectExpr("grp", "n_items",
          "CAST(n_items AS DOUBLE) AS n", "CAST(s1 AS DOUBLE) AS m1",
          "CAST(s2 AS DOUBLE) AS m2", "CAST(s3 AS DOUBLE) AS m3",
          "CAST(s4 AS DOUBLE) AS m4")
        .selectExpr("grp", "n_items", s"$jbF AS jb", s"$jbFlagF AS non_normal")
        .orderBy("grp")
    }),

    // Sketch ROLLUP — the pattern that makes approximate distinct usable
    // at 100 TB: build HLL sketches at the fine grain (per nation, as a
    // landing job would persist per shard/day), then roll up by MERGING
    // sketches — the region answer never re-scans raw data. HLL registers
    // are per-slot maxima, so build and merge are fully order- and
    // partition-independent: the estimate is DETERMINISTIC for a given
    // distinct set (ApproxSpec pins merged == direct-built exactly, and
    // both within 5% of exact). No DuckDB oracle: its HLL is a different
    // implementation (declared no_oracle like agg_distinct_approx).
    "agg_sketch_rollup" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      val perNation = c.groupBy("r_name", "n_name")
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      perNation.groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_customers"))
        .orderBy("r_name")
    }),

    // Per-group least-squares regression (slope / intercept / r^2) of
    // price on quantity — the agg_corr sibling that actually fits the
    // line. Same exactness pattern as agg_skew_kurt: all five sums are
    // EXACT integer centi-unit sums (DECIMAL(38,0) / HUGEINT — Syy
    // reaches ~6e19, past BIGINT), one double cast each, then the THREE
    // shared formula strings (regressionFormulas, spliced verbatim into
    // the oracle). Never the built-ins: regr_slope/corr accumulate
    // running doubles whose partial-merge order differs per engine.
    "agg_regression" -> ((s, d) => {
      val x = expr("CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))")
      val y = expr("CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS DECIMAL(38,0))")
      val (slopeF, interF, r2F) = regressionFormulas
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n_items"),
          sum(x).as("sxd"), sum(y).as("syd"), sum(x * y).as("sxyd"),
          sum(x * x).as("sxxd"), sum(y * y).as("syyd"))
        .selectExpr("grp", "n_items",
          "CAST(n_items AS DOUBLE) AS n", "CAST(sxd AS DOUBLE) AS sx",
          "CAST(syd AS DOUBLE) AS sy", "CAST(sxyd AS DOUBLE) AS sxy",
          "CAST(sxxd AS DOUBLE) AS sxx", "CAST(syyd AS DOUBLE) AS syy")
        .selectExpr("grp", "n_items",
          s"$slopeF AS slope", s"$interF AS intercept", s"$r2F AS r2")
        .orderBy("grp")
    }),

    // Differentially-private histogram release (r9c) — the mechanism a
    // pipeline runs before SHARING corpus statistics (per-source doc
    // counts to a partner, per-cohort rollups to a dashboard): add
    // discrete-Laplace noise to each count (ε = ln 2 per unit
    // sensitivity; the two-sided geometric with p = 1/2, truncated to
    // ±8 and renormalized). The noise is DETERMINISTIC by design —
    // inverse-CDF over the portable 60-bit salted hash of the GROUP KEY
    // against Scala-derived integer thresholds (the poissonThresholds /
    // aaWeights pattern), so re-runs and both engines release IDENTICAL
    // numbers: reproducible-release semantics (noise fixed per key per
    // salt epoch — rotate the salt to re-draw), and the whole mechanism
    // is fully oracled. Map-side: one keyed count, one hash per GROUP
    // (bounded), no second pass. A real release would drop n_true/noise
    // from the emission; they are emitted here because the contract IS
    // the mechanism arithmetic. GREATEST clamps the noisy count at 0.
    "agg_dp_counts" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_true"))
        .withColumn("h", SampleQueries.phash(col("n_name"), "dp:"))
        .selectExpr("n_name", "n_true", s"CAST(${dpNoiseSql("h")} AS BIGINT) AS noise")
        .selectExpr("n_name", "n_true", "noise",
          "GREATEST(n_true + noise, CAST(0 AS BIGINT)) AS n_noisy")
        .orderBy("n_name")
    }),

    // Custom typed UDAF surface. Rounded to 3 dp: the log-sum order differs
    // between engines and exp() amplifies the ulp drift past 1e-6.
    "agg_udaf_geomean" -> ((s, d) => {
      val geo = udaf(GeoMeanAgg)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r3(geo(col("l_extendedprice"))).as("geomean_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    })
  )

  /** Discrete-Laplace (two-sided geometric, p = 1/2 ⇒ ε = ln 2)
    * inverse-CDF thresholds on the 60-bit hash range, truncated to
    * [-8, 8] and renormalized: floor(CDF(k)/S · 2^60) for k = -8..7
    * (16 thresholds; h past the last ⇒ +8). Derived ONCE in Scala and
    * interpolated into query AND oracle (the poissonThresholds
    * pattern), so the double precision of the derivation is irrelevant
    * to parity. */
  private[queries] val dpThresholds: Seq[Long] = {
    val raw = (-8 to 8).map(k => math.pow(0.5, math.abs(k)))
    val tot = raw.sum
    raw.init.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c / tot * math.pow(2.0, 60)).toLong)
  }

  /** The noise CASE over a 60-bit hash column — shared formula string
    * (same literals, same comparison order, both dialects). */
  private[queries] def dpNoiseSql(h: String): String =
    dpThresholds.zipWithIndex
      .map { case (t, i) => s"WHEN $h < $t THEN ${i - 8}" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** ONE formula text for skewness / excess kurtosis over the double-cast
    * raw moments (m1..m4, n) — valid Spark SQL AND DuckDB SQL, used
    * verbatim by both so every intermediate IEEE op matches bit-for-bit.
    * Standardization uses v*sqrt(v) (correctly-rounded primitives), never
    * pow. Moments are in cents; skew/kurt are scale-invariant. */
  /** UNROUNDED skewness / excess-kurtosis strings over the double-cast
    * exact moments (n, m1..m4) — the shared core of agg_skew_kurt's
    * display emissions AND agg_jarque_bera's test statistic (which must
    * square the raw values, not the rounded ones). */
  private def skewKurtRaw: (String, String) = {
    val mu = "(m1/n)"
    val v = s"(m2/n - $mu*$mu)"
    (s"((m3/n - 3*$mu*(m2/n) + 2*$mu*$mu*$mu) / ($v * sqrt($v)))",
     s"((m4/n - 4*$mu*(m3/n) + 6*$mu*$mu*(m2/n) - 3*$mu*$mu*$mu*$mu) / ($v * $v) - 3)")
  }

  private def skewKurtFormulas: (String, String) = {
    val (s0, k0) = skewKurtRaw
    (r6Sql(s0), r6Sql(k0))
  }

  /** Jarque–Bera statistic + 5% verdict off the raw skew/kurt strings —
    * one fixed-order chain, shared verbatim (defs: init-order rule). */
  private def jbF: String = {
    val (s0, k0) = skewKurtRaw
    r6Sql(s"(n / 6.0) * ($s0 * $s0 + ($k0 * $k0) / 4.0)")
  }
  private def jbFlagF: String = s"$jbF > 5.99"

  /** Shared least-squares formula texts over the double-cast exact sums
    * (n, sx, sy, sxy, sxx, syy) — one definition for both engines, so
    * every IEEE op matches bit-for-bit (the skewKurtFormulas pattern). */
  private def regressionFormulas: (String, String, String) = {
    val cov = "(n*sxy - sx*sy)"
    val vx = "(n*sxx - sx*sx)"
    val vy = "(n*syy - sy*sy)"
    (r6Sql(s"$cov / $vx"),
     r6Sql(s"(sy - ($cov / $vx) * sx) / n"),
     r6Sql(s"($cov * $cov) / ($vx * $vy)"))
  }

  val oracle: Map[String, String] = Map(
    "agg_dp_counts" ->
      // the identical salted hash + the same Scala-derived threshold
      // literals (no DuckDB randomness anywhere); COUNT cast from the
      // r6d HUGEINT rule; GREATEST clamp mirrored
      ("WITH c AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_true " +
       "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1), " +
       s"h AS (SELECT n_name, n_true, ${hash60Sql("'dp:' || CAST(n_name AS VARCHAR)")} AS h FROM c), " +
       s"n AS (SELECT n_name, n_true, CAST(${dpNoiseSql("h")} AS BIGINT) AS noise FROM h) " +
       "SELECT n_name, n_true, noise, " +
       "GREATEST(n_true + noise, CAST(0 AS BIGINT)) AS n_noisy FROM n ORDER BY n_name"),
    "agg_regression" -> {
      val (slopeF, interF, r2F) = regressionFormulas
      "WITH b AS (SELECT l_returnflag AS grp, " +
        "CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS x, " +
        "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y FROM lineitem), " +
        "m AS (SELECT grp, COUNT(*) AS n_items, CAST(COUNT(*) AS DOUBLE) AS n, " +
        "CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy, " +
        "CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy FROM b GROUP BY 1) " +
        s"SELECT grp, n_items, $slopeF AS slope, $interF AS intercept, $r2F AS r2 " +
        "FROM m ORDER BY grp"
    },
    "agg_string_concat" ->
      ("SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, " +
       "COUNT(*) AS n_nations FROM nation JOIN region ON n_regionkey = r_regionkey " +
       "GROUP BY 1 ORDER BY 1"),
    "agg_jarque_bera" ->
      // same moment CTEs as the skew_kurt oracle, the shared raw-string
      // JB chain and the same 5.99 comparison
      ("WITH b AS (SELECT l_returnflag AS grp, " +
       "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c FROM lineitem), " +
       "m AS (SELECT grp, COUNT(*) AS n_items, " +
       "CAST(COUNT(*) AS DOUBLE) AS n, " +
       "CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS m1, " +
       "CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS m2, " +
       "CAST(SUM(CAST(c AS HUGEINT) * c * c) AS DOUBLE) AS m3, " +
       "CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) AS m4 FROM b GROUP BY 1) " +
       s"SELECT grp, n_items, $jbF AS jb, $jbFlagF AS non_normal " +
       "FROM m ORDER BY grp"),
    "agg_skew_kurt" -> {
      val (skewF, kurtF) = skewKurtFormulas
      "WITH b AS (SELECT l_returnflag AS grp, " +
        "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c FROM lineitem), " +
        "m AS (SELECT grp, COUNT(*) AS n_items, " +
        "CAST(COUNT(*) AS DOUBLE) AS n, " +
        "CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS m1, " +
        "CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS m2, " +
        "CAST(SUM(CAST(c AS HUGEINT) * c * c) AS DOUBLE) AS m3, " +
        "CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) AS m4 FROM b GROUP BY 1) " +
        s"SELECT grp, n_items, $skewF AS skewness, $kurtF AS kurtosis " +
        "FROM m ORDER BY grp"
    },
    "agg_histogram" ->
      // // is DuckDB integer division; SUM(BIGINT) returns HUGEINT — cast
      // back (CLAUDE.md rule) so the totals dtype matches
      ("WITH b AS (SELECT CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) // 5000000 AS INT) AS bucket " +
       "FROM orders), " +
       "c AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY 1), " +
       "t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c) " +
       "SELECT bucket, CAST(bucket AS BIGINT) * 50000 AS lo_dollars, n, " +
       "((CASE WHEN isnan((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))) OR abs((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))) >= 9e12 THEN CAST((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) AS DOUBLE) ELSE CAST(floor((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS frac " +
       "FROM c CROSS JOIN t ORDER BY bucket"),
    "agg_pareto" ->
      // row_number over the identical DESC order stands in for
      // globalRank; same decile DIV, same bounded cum self-join, the
      // shared shareF emission
      ("WITH rev AS (SELECT o_custkey AS cust, " +
       "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT)) AS BIGINT) AS cents " +
       "FROM orders GROUP BY 1), " +
       "r AS (SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, cust) AS BIGINT) AS rnk, " +
       "CAST(COUNT(*) OVER () AS BIGINT) AS nn FROM rev), " +
       "dc AS (SELECT CAST(((rnk - 1) * 10) // nn AS INT) AS decile, " +
       "CAST(COUNT(*) AS BIGINT) AS n_customers, " +
       "CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS cents FROM r GROUP BY 1), " +
       "cm AS (SELECT a.decile, a.n_customers, a.cents, " +
       "CAST(SUM(b.cents) AS BIGINT) AS cum_cents FROM dc a JOIN dc b " +
       "ON b.decile <= a.decile GROUP BY 1, 2, 3), " +
       "t AS (SELECT CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS tc FROM dc) " +
       s"SELECT decile, n_customers, cents, cum_cents, ${shareF("cum_cents")} AS cum_share " +
       "FROM cm CROSS JOIN t ORDER BY decile"),
    "agg_topk_other" ->
      // same revenue frame, LIMITed top-10, NOT IN remainder, the
      // shared shareF emission; label ORDER is plain binary string
      // comparison on both engines
      ("WITH rev AS (SELECT o_custkey AS cust, " +
       "CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS HUGEINT)) AS BIGINT) AS cents " +
       "FROM orders GROUP BY 1), " +
       "tp AS (SELECT cust, cents FROM rev ORDER BY cents DESC, cust LIMIT 10), " +
       "oth AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_customers, " +
       "CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS cents FROM rev " +
       "WHERE cust NOT IN (SELECT cust FROM tp)), " +
       "t AS (SELECT CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS tc FROM rev), " +
       "u AS (SELECT CAST(cust AS VARCHAR) AS label, CAST(1 AS BIGINT) AS n_customers, cents FROM tp " +
       "UNION ALL SELECT 'OTHER', n_customers, cents FROM oth) " +
       s"SELECT label, n_customers, cents, ${shareF("cents")} AS share " +
       "FROM u CROSS JOIN t ORDER BY label"),
    "agg_theil" ->
      // shared mu/share/term formulas verbatim; list(... ORDER BY nk) ==
      // the nation-ascending collect_list+sort folds; HUGEINT mirrors
      // DECIMAL(38,0); r3 on every ln-derived emission
      ("WITH x AS (SELECT c_nationkey AS nk, " +
       "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents " +
       "FROM orders JOIN customer ON o_custkey = c_custkey), " +
       "g AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS ng, " +
       "SUM(CAST(cents AS HUGEINT)) AS sg FROM x GROUP BY 1), " +
       "tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, SUM(CAST(sg AS HUGEINT)) AS st FROM g), " +
       s"tw AS (SELECT x.nk, SUM($theilTermQ) AS tsumq " +
       "FROM x JOIN g ON x.nk = g.nk GROUP BY 1), " +
       s"p1 AS (SELECT g.nk AS nk, ng, n, st, $theilTwFormula AS t_w_raw, " +
       s"$theilShareFormula AS share_raw, $theilMuFormula AS mug_raw " +
       "FROM g JOIN tw ON g.nk = tw.nk CROSS JOIN tot), " +
       "p2 AS (SELECT nk, ng, share_raw, mug_raw, t_w_raw, " +
       "share_raw * ln(mug_raw / (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))) AS tb_term, " +
       "share_raw * t_w_raw AS tt_term FROM p1), " +
       "sc AS (SELECT list_sum(list(tb_term ORDER BY nk)) AS t_between_raw, " +
       "list_sum(list(tt_term ORDER BY nk)) AS t_in_raw FROM p2) " +
       "SELECT nk AS nationkey, ng AS n_orders, " +
       s"${r6Sql("share_raw")} AS share, " +
       s"${r6Sql("mug_raw / 100.0")} AS mean_price, " +
       s"${r3Sql("t_w_raw")} AS t_within, " +
       s"${r3Sql("t_between_raw")} AS t_between, " +
       s"${r3Sql("t_between_raw + t_in_raw")} AS t_total " +
       "FROM p2 CROSS JOIN sc ORDER BY nationkey"),
    "agg_hhi" ->
      // per-customer cents (SUM(BIGINT)→HUGEINT cast back), HUGEINT
      // Σ/Σ² mirrors of the DECIMAL(38,0)s, shared hhi/eff_n formulas
      ("WITH cu AS (SELECT o_custkey, " +
       "CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cc " +
       "FROM orders GROUP BY 1), " +
       "j AS (SELECT c_nationkey, cc FROM cu JOIN customer ON o_custkey = c_custkey), " +
       "a AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers, " +
       "SUM(CAST(cc AS HUGEINT)) AS tot, SUM(CAST(cc AS HUGEINT) * cc) AS ssq " +
       "FROM j GROUP BY 1) " +
       "SELECT c_nationkey, n_customers, " +
       s"$hhiF AS hhi, $effNF AS effective_n " +
       "FROM a ORDER BY c_nationkey"),
    "agg_gini" ->
      // row_number over the identical unique (cents, key) order stands in
      // for globalRank; HUGEINT moment sums mirror the DECIMAL(38,0)s
      ("WITH v AS (SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents, " +
       "o_orderkey AS k FROM orders), " +
       "r AS (SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents, k) AS BIGINT) AS rnk FROM v), " +
       "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(cents AS HUGEINT)) AS sx, " +
       "SUM(CAST(rnk AS HUGEINT) * cents) AS sxr FROM r) " +
       s"SELECT n, CAST(sx AS DOUBLE) / 100.0 AS total_price, $giniSql AS gini FROM m"),
    "agg_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
       "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
       "CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS DECIMAL(18,0))*CAST(0.01 AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price, " +
       "CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*(1+l_tax)*100 + 0.5) AS DECIMAL(18,0))*CAST(0.01 AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge, " +
       "((CASE WHEN isnan((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) OR abs((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) >= 9e12 THEN CAST((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS avg_qty, " +
       "((CASE WHEN isnan((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) OR abs((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) >= 9e12 THEN CAST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS avg_price, " +
       "((CASE WHEN isnan((CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*))) OR abs((CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*))) >= 9e12 THEN CAST((CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS avg_disc, " +
       "COUNT(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' " +
       "GROUP BY 1,2 ORDER BY 1,2"),
    "agg_distinct_exact" ->
      ("SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part, " +
       "COUNT(DISTINCT l_suppkey) AS nd_supp FROM lineitem GROUP BY 1 ORDER BY 1"),
    "agg_bitmap_distinct" ->
      // the identical 63-bit math; SUM comes back HUGEINT — cast
      ("WITH bm AS (SELECT o_orderpriority, o_custkey // 63 AS bucket, " +
       "bit_or(1::BIGINT << CAST(o_custkey % 63 AS INT)) AS m " +
       "FROM orders GROUP BY 1, 2) " +
       "SELECT o_orderpriority, COUNT(*) AS n_buckets, " +
       "CAST(SUM(bit_count(m)) AS BIGINT) AS n_distinct " +
       "FROM bm GROUP BY 1 ORDER BY 1"),
    "agg_rollup" ->
      ("SELECT r_name, n_name, CAST(GROUPING(r_name)*2 + GROUPING(n_name) AS INT) AS gid, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, COUNT(*) AS n_orders " +
       "FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name) " +
       "ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST"),
    "agg_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, " +
       "CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid, COUNT(*) AS cnt " +
       "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
       "ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"),
    "agg_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, " +
       "CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid, COUNT(*) AS cnt " +
       "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
       "ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"),
    "agg_having" ->
      ("SELECT c_mktsegment, ((CASE WHEN isnan((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) OR abs((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) >= 9e12 THEN CAST((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS avg_bal, " +
       "COUNT(*) AS n_cust FROM customer GROUP BY 1 " +
       "HAVING ((CASE WHEN isnan((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) OR abs((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*))) >= 9e12 THEN CAST((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) > 4000.0 ORDER BY 1"),
    "agg_extrema" ->
      ("SELECT l_returnflag, ((CASE WHEN isnan((median(l_extendedprice))) OR abs((median(l_extendedprice))) >= 9e12 THEN CAST((median(l_extendedprice)) AS DOUBLE) ELSE CAST(floor((median(l_extendedprice)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS med_price, " +
       "arg_min(l_orderkey, l_extendedprice) AS cheapest_order, " +
       "arg_max(l_orderkey, l_extendedprice) AS dearest_order, " +
       "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price " +
       "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "agg_stats" ->
      ("SELECT event_type, MIN(value) AS min_v, MAX(value) AS max_v, " +
       "((CASE WHEN isnan((STDDEV_SAMP(value))) OR abs((STDDEV_SAMP(value))) >= 9e12 THEN CAST((STDDEV_SAMP(value)) AS DOUBLE) ELSE CAST(floor((STDDEV_SAMP(value)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS std_v, ((CASE WHEN isnan((quantile_cont(value, 0.5))) OR abs((quantile_cont(value, 0.5))) >= 9e12 THEN CAST((quantile_cont(value, 0.5)) AS DOUBLE) ELSE CAST(floor((quantile_cont(value, 0.5)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS med_v, " +
       "COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1"),
    "agg_corr" ->
      ("SELECT l_returnflag, ((CASE WHEN isnan((corr(l_quantity, l_extendedprice))) OR abs((corr(l_quantity, l_extendedprice))) >= 9e12 THEN CAST((corr(l_quantity, l_extendedprice)) AS DOUBLE) ELSE CAST(floor((corr(l_quantity, l_extendedprice)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS corr_qty_price, " +
       "((CASE WHEN isnan((covar_samp(l_quantity, l_extendedprice))) OR abs((covar_samp(l_quantity, l_extendedprice))) >= 9e12 THEN CAST((covar_samp(l_quantity, l_extendedprice)) AS DOUBLE) ELSE CAST(floor((covar_samp(l_quantity, l_extendedprice)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS covar_qty_price, " +
       "COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"),
    "agg_weighted_avg" ->
      ("SELECT l_returnflag, " +
       "((CASE WHEN isnan((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)" +
       "/CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))) OR abs((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)" +
       "/CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))) >= 9e12 THEN CAST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)" +
       "/CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)" +
       "/CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS wavg_price, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
       "COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"),
    "agg_mode" ->
      ("WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt " +
       "FROM orders GROUP BY 1,2), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus " +
       "ORDER BY cnt DESC, o_orderpriority) AS rn, " +
       "CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n_orders FROM c) " +
       "SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_cnt, n_orders " +
       "FROM r WHERE rn = 1 ORDER BY o_orderstatus"),
    "agg_winsorized_mean" ->
      // identical rank selection (// == DIV), identical clamp, HUGEINT
      // cent sums cast once, the shared money/mean formula strings
      ("WITH b AS (SELECT o_orderpriority AS grp, " +
       "CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents, o_orderkey FROM orders), " +
       "w AS (SELECT grp, cents, " +
       "ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, o_orderkey) AS rn, " +
       "COUNT(*) OVER (PARTITION BY grp) AS n FROM b), " +
       "p AS (SELECT grp, " +
       "MAX(CASE WHEN rn = ((n - 1) * 1) // 20 + 1 THEN cents END) AS p05c, " +
       "MAX(CASE WHEN rn = ((n - 1) * 19) // 20 + 1 THEN cents END) AS p95c FROM w GROUP BY 1), " +
       "c AS (SELECT b.grp AS grp, cents, p05c, p95c, " +
       "CASE WHEN cents < p05c THEN p05c WHEN cents > p95c THEN p95c ELSE cents END AS wc " +
       "FROM b JOIN p ON b.grp = p.grp), " +
       "m AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "SUM(CAST(cents AS HUGEINT)) AS sr, SUM(CAST(wc AS HUGEINT)) AS sw, " +
       "MAX(p05c) AS p05c, MAX(p95c) AS p95c FROM c GROUP BY 1) " +
       s"SELECT grp, n_orders, ${centsMoneyF("p05c")} AS p05, " +
       s"${centsMoneyF("p95c")} AS p95, ${wmeanF("sr")} AS mean_raw, " +
       s"${wmeanF("sw")} AS mean_winsorized FROM m ORDER BY grp"),
    "agg_percentile_disc" ->
      // the shared selection rule: 1-based position ((n-1)*p_num) // p_den
      // + 1 of the (cents, o_orderkey)-sorted group; // is DuckDB integer
      // division (Spark DIV). ROW_NUMBER/COUNT stay BIGINT internally.
      ("WITH b AS (SELECT o_orderpriority AS grp, " +
       "CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents, o_orderkey FROM orders), " +
       "w AS (SELECT grp, cents, " +
       "ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, o_orderkey) AS rn, " +
       "COUNT(*) OVER (PARTITION BY grp) AS n FROM b) " +
       "SELECT grp, " +
       "CAST(CAST(MAX(CASE WHEN rn = ((n - 1) * 1) // 2 + 1 THEN cents END) AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DOUBLE) AS p50, " +
       "CAST(CAST(MAX(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN cents END) AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DOUBLE) AS p90, " +
       "CAST(CAST(MAX(CASE WHEN rn = ((n - 1) * 99) // 100 + 1 THEN cents END) AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DOUBLE) AS p99, " +
       "COUNT(*) AS n_orders FROM w GROUP BY grp ORDER BY grp"),
    "agg_udaf_geomean" ->
      ("SELECT l_returnflag, ((CASE WHEN isnan((EXP(AVG(LN(l_extendedprice))))) OR abs((EXP(AVG(LN(l_extendedprice))))) >= 9e12 THEN CAST((EXP(AVG(LN(l_extendedprice)))) AS DOUBLE) ELSE CAST(floor((EXP(AVG(LN(l_extendedprice)))) * 1e3 + 0.5) AS DOUBLE) / 1e3 END)) AS geomean_price, " +
       "COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1")
  )
}
