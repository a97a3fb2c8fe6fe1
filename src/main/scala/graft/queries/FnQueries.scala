package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Qutil._

/** SURVEY §2.8 — scalar-function suite (string/date/math/array/map/json/
  * explode/UDF): the field-cleansing layer of a Salesforce migration
  * (/root/reference/README.md:3). Everything except fn_udf_scalar stays in
  * built-in (codegen'd) expressions per the §4.3 design rules. */
object FnQueries {

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        trim(col("p_name")).as("trimmed"),
        substring(col("p_name"), 1, 8).as("sub8"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        split(col("p_type"), " ").getItem(0).as("type_head"))
        .orderBy("p_partkey")),

    // Monthly revenue + the datetime function battery applied to the month.
    "fn_date" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n_orders"), sumDec2(col("o_totalprice")).as("revenue"))
        .select(col("mon"),
          year(col("mon")).as("yr"),
          quarter(col("mon")).as("qtr"),
          month(col("mon")).as("mo"),
          dayofweek(col("mon")).as("dow_first"),
          date_add(col("mon"), 30).as("plus30"),
          last_day(col("mon")).as("eom"),
          datediff(last_day(col("mon")), col("mon")).as("mdays"),
          col("n_orders"), col("revenue"))
        .orderBy("mon")),

    "fn_math" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        rScale(col("l_extendedprice"), 1e1).as("price_r1"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_extendedprice")).as("ceil_p"),
        floor(col("l_extendedprice")).as("floor_p"),
        r6(pow(col("l_quantity"), 2)).as("qty_sq"),
        r6(log(col("l_extendedprice"))).as("ln_p"),
        r6(log10(col("l_extendedprice"))).as("log10_p"),
        r6(sqrt(col("l_quantity"))).as("sqrt_q"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod"),
        signum(col("l_discount") - 0.05).as("sgn"))
        .orderBy("l_orderkey", "l_linenumber", "price_r1", "abs_d", "qty_sq",
          "ln_p", "sqrt_q")),

    // Bitwise surface (completes §2.8's integer-function coverage): AND /
    // OR / XOR / shifts / popcount — the ops partition-pruning bitmap
    // tricks and bloom/bitmap indexes are built from. Row-local, codegen'd,
    // shuffle only for the presentation sort. bit_count is INT on Spark
    // and TINYINT on DuckDB — both sides cast to INT.
    "fn_bitwise" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey"),
        col("c_custkey").bitwiseAND(lit(255L)).as("and_255"),
        col("c_custkey").bitwiseOR(lit(16L)).as("or_16"),
        col("c_custkey").bitwiseXOR(col("c_nationkey")).as("xor_nat"),
        shiftleft(col("c_custkey"), 2).as("shl_2"),
        shiftright(col("c_custkey"), 3).as("shr_3"),
        bit_count(col("c_custkey")).cast(IntegerType).as("popcnt"))
        .orderBy("c_custkey")),

    // Higher-order functions over the 64-dim float vectors — no UDF, all
    // Catalyst expressions (codegen + pushdown survive). The sorted head-4
    // slice is emitted as four scalar float columns, not one ARRAY column:
    // ndarray cells crash the driver's lexsort (round-1 VERDICT.md #2), and
    // scalars also dodge cross-engine float->string formatting.
    "fn_array" -> ((s, d) => {
      val h4 = sort_array(slice(col("embedding"), 1, 4))
      Tables.embeddings(s, d).select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("e1"),
        array_max(col("embedding")).as("emax"),
        array_min(col("embedding")).as("emin"),
        element_at(h4, 1).as("h1"),
        element_at(h4, 2).as("h2"),
        element_at(h4, 3).as("h3"),
        element_at(h4, 4).as("h4"),
        r6(sqrt(aggregate(
          transform(col("embedding"), v => v.cast(DoubleType) * v.cast(DoubleType)),
          lit(0.0), (acc, x) => acc + x))).as("l2_norm"))
        .orderBy("vec_id")
    }),

    // props JSON string -> MapType; modular bucket aggregation on the value.
    // The map is materialized ONCE in a prior projection so from_json runs
    // one parse per row even if codegen subexpression elimination bails.
    "fn_map_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
        .select((element_at(col("m"), "k") % 10).as("kmod"),
          size(map_keys(col("m"))).as("nkeys"))
        .groupBy("kmod", "nkeys")
        .agg(count(lit(1)).as("n"))
        .orderBy("kmod", "nkeys")),

    // Spark 4 VariantType path (r3): parse the JSON payload ONCE into a
    // variant, extract typed fields with variant_get, aggregate. Variant
    // is the modern semi-structured answer (binary-encoded, no schema
    // declared up front — vs from_json's fixed StructType/MapType in
    // source_json_infer/fn_map_json); at 100 TB the parse happens once at
    // land time and extraction is a cheap binary traversal per query.
    "fn_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"),
          r6(sum(col("k")).cast(DoubleType) / count(col("k"))).as("avg_k"))
        .orderBy("event_type")),

    // Generator surface: split -> explode -> token rows -> top-50.
    "fn_explode_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(50)),

    // Fuzzy entity matching — the master-data dedup every Salesforce
    // migration runs ("are these two part names the same thing?"). Two
    // scale controls: (1) match the DISTINCT-NAME dictionary, never part
    // rows (names repeat heavily; row-level pairing squares the
    // duplication — measured 106k pairs from 2k parts; the dictionary is
    // the bounded vocabulary), carrying occurrence counts for triage;
    // (2) BLOCK on the entity noun (second name token): candidate
    // enumeration is an equality join — the inverted-index shape — and
    // only block-mates pay the levenshtein DP. dist in [1,3]: 0 is exact
    // dedup's job. Both engines implement classic unit-cost levenshtein;
    // the threshold is an integer compare.
    "fn_fuzzy_match" -> ((s, d) => {
      val p = Tables.part(s, d)
        .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
        // try_element_at: a one-token name must block as NULL (dropped by
        // the equality join) like the oracle's string_split[2] — plain
        // element_at THROWS under Spark 4 ANSI on out-of-bounds
        .withColumn("noun", try_element_at(split(col("p_name"), " "), lit(2)))
      val dist = levenshtein(col("a.p_name"), col("b.p_name"))
      p.as("a").join(p.as("b"),
          col("a.noun") === col("b.noun") &&
          col("a.p_name") < col("b.p_name") &&
          dist.between(1, 3))
        .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"),
          dist.cast(IntegerType).as("dist"))
        .orderBy("name_a", "name_b")
    }),

    // PII landing transform (r6) — the policy pass a Salesforce-style
    // migration runs BEFORE the first byte lands (README.md:3 objects are
    // person records): deterministic pseudonymization (sha256 token —
    // referential integrity and joins survive across tables/increments,
    // the raw name does not), display masking (first char + '***'), and
    // k-anonymity-style generalization of the numeric attribute into
    // $1000 buckets. All row-local/codegen'd — map-side at any scale.
    // Bucket arithmetic: exact cents (floor(x*100+0.5)) offset to
    // non-negative THEN integer-divided — Spark DIV and DuckDB // agree
    // on non-negative operands; a raw negative acctbal would hit their
    // differing negative-division conventions, and a double divide would
    // split boundary values across buckets per engine.
    "fn_pii_mask" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        substring(sha2(concat(lit("pii:"), col("c_name")), 256), 1, 16)
          .as("name_token"),
        concat(substring(col("c_name"), 1, 1), lit("***")).as("name_masked"),
        col("c_mktsegment"),
        expr("CAST((CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) + 1000000) DIV 100000 AS INT)")
          .as("acctbal_bucket"))
        .orderBy("c_custkey")),

    // The single demo Scala UDF (SURVEY §4.3 rule 1 allows exactly one).
    "fn_udf_scalar" -> ((s, d) => {
      val cleanText = udf((t: String) =>
        if (t == null) null else t.toLowerCase.replaceAll("[^a-z0-9 ]", ""))
      Tables.documents(s, d)
        .select(col("doc_id"), cleanText(substring(col("text"), 1, 40)).as("cleaned"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "fn_pii_mask" ->
      ("SELECT c_custkey, " +
       "substring(sha256('pii:' || c_name), 1, 16) AS name_token, " +
       "substring(c_name, 1, 1) || '***' AS name_masked, c_mktsegment, " +
       "CAST((CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) + 1000000) // 100000 AS INT) AS acctbal_bucket " +
       "FROM customer ORDER BY c_custkey"),
    "fn_string" ->
      ("SELECT p_partkey, UPPER(p_name) AS up_name, LOWER(p_brand) AS lo_brand, " +
       "TRIM(p_name) AS trimmed, substring(p_name, 1, 8) AS sub8, " +
       "concat_ws('|', p_brand, p_type) AS joined, CAST(length(p_name) AS INT) AS name_len, " +
       "replace(p_type, ' ', '_') AS type_us, lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad, " +
       "regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num, " +
       "string_split(p_type, ' ')[1] AS type_head FROM part ORDER BY p_partkey"),
    "fn_date" ->
      ("SELECT mon, CAST(year(mon) AS INT) AS yr, CAST(quarter(mon) AS INT) AS qtr, " +
       "CAST(month(mon) AS INT) AS mo, CAST(dayofweek(mon) + 1 AS INT) AS dow_first, " +
       "CAST(mon AS DATE) + 30 AS plus30, last_day(CAST(mon AS DATE)) AS eom, " +
       "CAST(date_diff('day', CAST(mon AS DATE), last_day(CAST(mon AS DATE))) AS INT) AS mdays, " +
       "n_orders, revenue FROM (SELECT date_trunc('month', o_orderdate) AS mon, COUNT(*) AS n_orders, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
       "FROM orders GROUP BY 1) ORDER BY mon"),
    "fn_bitwise" ->
      ("SELECT c_custkey, c_custkey & 255 AS and_255, c_custkey | 16 AS or_16, " +
       "xor(c_custkey, c_nationkey) AS xor_nat, c_custkey << 2 AS shl_2, " +
       "c_custkey >> 3 AS shr_3, CAST(bit_count(c_custkey) AS INT) AS popcnt " +
       "FROM customer ORDER BY c_custkey"),
    "fn_math" ->
      ("SELECT l_orderkey, l_linenumber, ((CASE WHEN isnan((l_extendedprice)) OR abs((l_extendedprice)) >= 9e12 THEN CAST((l_extendedprice) AS DOUBLE) ELSE CAST(floor((l_extendedprice) * 1e1 + 0.5) AS DOUBLE) / 1e1 END)) AS price_r1, " +
       "ABS(l_discount - 0.05) AS abs_d, CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_p, " +
       "CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p, ((CASE WHEN isnan((POW(l_quantity, 2))) OR abs((POW(l_quantity, 2))) >= 9e12 THEN CAST((POW(l_quantity, 2)) AS DOUBLE) ELSE CAST(floor((POW(l_quantity, 2)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS qty_sq, " +
       "((CASE WHEN isnan((LN(l_extendedprice))) OR abs((LN(l_extendedprice))) >= 9e12 THEN CAST((LN(l_extendedprice)) AS DOUBLE) ELSE CAST(floor((LN(l_extendedprice)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS ln_p, ((CASE WHEN isnan((LOG10(l_extendedprice))) OR abs((LOG10(l_extendedprice))) >= 9e12 THEN CAST((LOG10(l_extendedprice)) AS DOUBLE) ELSE CAST(floor((LOG10(l_extendedprice)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS log10_p, " +
       "((CASE WHEN isnan((SQRT(l_quantity))) OR abs((SQRT(l_quantity))) >= 9e12 THEN CAST((SQRT(l_quantity)) AS DOUBLE) ELSE CAST(floor((SQRT(l_quantity)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS sqrt_q, l_orderkey % 7 AS key_mod, " +
       "CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn FROM lineitem " +
       "ORDER BY l_orderkey, l_linenumber, price_r1, abs_d, qty_sq, ln_p, sqrt_q"),
    "fn_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INT) AS dim, embedding[1] AS e1, " +
       "list_aggregate(embedding, 'max') AS emax, list_aggregate(embedding, 'min') AS emin, " +
       "list_sort(embedding[1:4])[1] AS h1, list_sort(embedding[1:4])[2] AS h2, " +
       "list_sort(embedding[1:4])[3] AS h3, list_sort(embedding[1:4])[4] AS h4, " +
       "((CASE WHEN isnan((sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)))))) OR abs((sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE)))))) >= 9e12 THEN CAST((sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))) AS DOUBLE) ELSE CAST(floor((sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS l2_norm " +
       "FROM embeddings ORDER BY vec_id"),
    "fn_map_json" ->
      ("SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS kmod, " +
       "CAST(len(json_keys(props)) AS INT) AS nkeys, COUNT(*) AS n " +
       "FROM events GROUP BY 1,2 ORDER BY 1,2"),
    "fn_variant" ->
      ("SELECT event_type, COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k, " +
       "((CASE WHEN isnan((CAST(SUM(k) AS DOUBLE)/COUNT(k))) OR abs((CAST(SUM(k) AS DOUBLE)/COUNT(k))) >= 9e12 THEN CAST((CAST(SUM(k) AS DOUBLE)/COUNT(k)) AS DOUBLE) ELSE CAST(floor((CAST(SUM(k) AS DOUBLE)/COUNT(k)) * 1e6 + 0.5) AS DOUBLE) / 1e6 END)) AS avg_k FROM " +
       "(SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events) " +
       "GROUP BY 1 ORDER BY 1"),
    "fn_explode_tokens" ->
      ("SELECT tok, COUNT(*) AS cnt FROM " +
       "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
       "GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 50"),
    "fn_fuzzy_match" ->
      ("WITH p AS (SELECT p_name, COUNT(*) AS n, string_split(p_name, ' ')[2] AS noun " +
       "FROM part GROUP BY 1) " +
       "SELECT a.p_name AS name_a, b.p_name AS name_b, a.n AS n_a, b.n AS n_b, " +
       "CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist " +
       "FROM p a JOIN p b ON a.noun = b.noun AND a.p_name < b.p_name " +
       "AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3 ORDER BY name_a, name_b"),
    "fn_udf_scalar" ->
      ("SELECT doc_id, regexp_replace(lower(substring(text, 1, 40)), '[^a-z0-9 ]', '', 'g') AS cleaned " +
       "FROM documents ORDER BY doc_id")
  )
}
