package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function battery F1–F20 + U1/U2 from SURVEY.md §2.7–2.8, each as
  * an oracle-checked query over the TPC-H-ish fixtures.
  *
  * The reference's two Python UDFs (likert map, mojibake repair) are
  * deliberately re-expressed as native expressions (map-literal lookup,
  * nested regexp_replace) so the whole plan stays inside whole-stage
  * codegen — no serialization boundary, which at 100 TB is the single
  * biggest win over the reference design (SURVEY.md §4).
  *
  * DuckDB-parity notes: regexp_replace needs the 'g' flag on the oracle
  * side; failing casts use try_cast on both sides (Spark 4 runs ANSI mode
  * by default); character classes are spelled ASCII-explicitly so Java and
  * RE2 agree.
  */
object Functions {
  import Tables._

  /** U1 likert vocabulary re-keyed to the fixture's priority column. */
  private val likert: Seq[(String, Int)] = Seq(
    "1-URGENT" -> 2, "2-HIGH" -> 1, "3-MEDIUM" -> 0,
    "4-NOT SPECIFIED" -> -1, "5-LOW" -> -2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — first-match-wins when-chain, 7 branches mirroring the Is_Invalid
    // precedence (ref transform_alchemer_data.py:201-224)
    "f01_when_chain" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F", "AdminOK")
          .when(col("o_totalprice") < 1000, "Partial")
          .when(col("o_orderstatus") === "P", "Disqualified")
          .when(col("o_orderstatus") =!= "O" && col("o_orderstatus") =!= "F", "NotComplete")
          .when(col("o_orderpriority") === "5-LOW", "TestLink")
          .when(col("o_custkey") % 100 === 0, "NonUS")
          .otherwise("Valid").as("flag"))
        .orderBy("o_orderkey")),

    // F2 — SQL CASE WHEN via expr (ref merge_census.py:95-103)
    "f02_expr_case" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        expr("CASE WHEN o_totalprice >= 200000 THEN 'Overrepresented' " +
          "WHEN o_totalprice <= 50000 THEN 'Underrepresented' " +
          "ELSE 'Within range' END").as("rep"))
        .orderBy("o_orderkey")),

    // F3 — coalesce null fill (ref merge_census.py:38-39,49-54)
    "f03_coalesce" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        coalesce(
          when(col("o_orderstatus") === "O", col("o_totalprice")),
          when(col("o_orderstatus") === "F", col("o_totalprice")),
          lit(0.0)).as("filled"))
        .orderBy("o_orderkey")),

    // F4 — lit constants (ref utils.py:214-217)
    "f04_lit" -> ((s, d) =>
      region(s, d).select(
        col("r_regionkey"),
        lit("Kingston").as("city"),
        lit(5).as("domains"),
        lit(2.5).as("weight"))
        .orderBy("r_regionkey")),

    // F5 — nested regexp_replace (ref transform_alchemer_data.py:21)
    "f05_regexp_nested" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        regexp_replace(regexp_replace(col("p_name"), "[aeiou]", ""), " +", " ")
          .as("consonants"))
        .orderBy("p_partkey")),

    // F6 — lower/upper (ref utils.py:186, transform_alchemer_data.py:204-205)
    "f06_case_fns" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        upper(col("p_brand")).as("brand_uc"))
        .orderBy("p_partkey")),

    // F7 — trim (ref transform_alchemer_data.py:116,128,144)
    "f07_trim" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"))
        .orderBy("p_partkey")),

    // F8 — concat string building (ref transform_alchemer_data.py:215)
    "f08_concat" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        concat(col("p_brand"), lit(" / "), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")),

    // F9 — substr(1,5) + int cast, incl. a failing cast → null
    // (ref transform_alchemer_data.py:153-162)
    "f09_substr_cast" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        substring((col("c_custkey") + 1000000).cast("string"), 1, 5)
          .cast("int").as("zip5"),
        expr("try_cast(substring(c_name, 1, 5) AS int)").as("bad_zip"))
        .orderBy("c_custkey")),

    // F10 — format_string %-formatting (ref utils.py:218). c_acctbal carries
    // exactly-2dp values so %.2f prints without an engine-dependent rounding
    // step (SURVEY.md §7 risk register).
    "f10_format_string" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        format_string("%.2f%%", col("c_acctbal")).as("pct_str"))
        .orderBy("c_custkey")),

    // F11 — null-phrase scrubber: lower → punct-strip → trim → isin → null
    // (ref utils.py:184-187, incl. the adjacent-literal typo phrase from
    // utils.py:105-106 preserved as one concatenated phrase)
    "f11_null_phrase_scrub" -> ((s, d) => {
      val norm = trim(regexp_replace(lower(col("c_mktsegment")), "[^a-zA-Z0-9 ]", ""))
      customer(s, d).select(
        col("c_custkey"),
        when(norm.isin("automobile", "building", "nada mas que agregarnot really"), lit(null))
          .otherwise(col("c_mktsegment")).as("segment"))
        .orderBy("c_custkey")
    }),

    // F12 — literal "nan" → null scrub over every string column
    // (ref transform_alchemer_data.py:38-39)
    "f12_nan_scrub" -> ((s, d) => {
      val seeded = customer(s, d).select(
        col("c_custkey"),
        when(col("c_mktsegment") === "MACHINERY", "nan")
          .otherwise(col("c_mktsegment")).as("seg"),
        col("c_name"))
      import org.apache.spark.sql.types.StringType
      seeded.select(seeded.schema.fields.map { f =>
        if (f.dataType == StringType)
          when(col(f.name) === "nan", lit(null)).otherwise(col(f.name)).as(f.name)
        else col(f.name)
      }.toSeq: _*).orderBy("c_custkey")
    }),

    // F13 — offline-ID prefix concat (ref extract_alchemer_data.py:14)
    "f13_prefix_concat" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        concat(lit("Offline #"), col("c_custkey").cast("string")).as("offline_id"))
        .orderBy("c_custkey")),

    // F14 — 12-hour AM/PM timestamp format round-trip
    // (ref transform_alchemer_data.py:49-50; the LEGACY parser policy is not
    // needed for well-formed round-trips on Spark 4's default parser)
    "f14_to_timestamp" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        to_timestamp(
          date_format(col("ts"), "MM/dd/yyyy hh:mm:ss a"),
          "MM/dd/yyyy hh:mm:ss a").as("parsed"))
        .orderBy("event_id")),

    // F15 — unix_timestamp difference in seconds (ref transform_alchemer_data.py:53)
    "f15_unix_ts_diff" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(date_trunc("DAY", col("ts"))))
          .as("secs_into_day"))
        .orderBy("event_id")),

    // F16 — date_format MM/dd/yyyy (ref merge_census.py:134)
    "f16_date_format" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "MM/dd/yyyy").as("order_dt"))
        .orderBy("o_orderkey")),

    // F18 — abs (ref merge_census.py:112)
    "f18_abs" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        abs(col("l_discount") - col("l_tax")).as("rate_gap"))
        .orderBy("l_orderkey", "l_linenumber")),

    // F19 — n-ary fold row-wise mean (ref transform_alchemer_data.py:67-75)
    "f19_rowwise_mean" -> ((s, d) => {
      val cols = Seq(col("l_quantity"), col("l_linenumber").cast("double"),
        (col("l_partkey") % 10).cast("double"))
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(cols.reduce(_ + _) / lit(cols.size), 2).as("row_mean"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F20 — cast int/float/string (ref transform_alchemer_data.py:157, merge_census.py:79-80)
    "f20_cast" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_orderkey").cast("string").as("key_str"),
        col("l_discount").cast("float").as("disc_f"))
        .orderBy("l_orderkey", "l_linenumber")),

    // F21 (extension) — semi-structured extraction: parse the JSON props
    // column per row and aggregate the extracted field. get_json_object is
    // codegen'd; at 100 TB prefer from_json with an explicit schema once
    // the shape is known (single parse, typed struct, pruned fields).
    "f21_json_extract" -> ((s, d) =>
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // F22 (extension) — the typed JSON path: from_json with an explicit
    // schema parses once into a struct (fields pruned at parse time),
    // where f21's get_json_object re-parses per extraction. Same result,
    // production plan shape.
    "f22_from_json" -> ((s, d) =>
      events(s, d)
        .withColumn("p",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("p.k")).as("sum_k"),
          max(col("p.k")).as("max_k"))
        .orderBy("event_type")),

    // F23 (extension) — null-handling battery: nullif / nvl2 / nanvl
    // shapes, all codegen'd conditionals.
    "f23_null_fns" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        expr("nullif(o_orderstatus, 'O')").as("status_nz"),
        expr("nvl2(nullif(o_orderstatus, 'O'), 'closed', 'open')").as("state"),
        coalesce(nullif(col("o_orderpriority"), lit("3-MEDIUM")),
          lit("(default)")).as("prio_nz"))
        .orderBy("o_orderkey")),

    // F24 (extension) — string battery: split_part, translate, initcap,
    // lpad/rpad, repeat, reverse, position — the everyday cleanup verbs.
    "f24_string_battery" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        expr("split_part(c_name, '#', 2)").as("cust_num"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        initcap(lower(col("c_mktsegment"))).as("seg_cap"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_pad"),
        expr("repeat('ab', 3)").as("rep"),
        reverse(col("c_name")).as("name_rev"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"))
        .orderBy("c_custkey")),

    // F25 (extension) — grouped array aggregation, stringified: sorted
    // collect_list is the order-insensitive distributed form (collect
    // order is partition-dependent; the sort pins determinism).
    "f25_collect_sorted" -> ((s, d) =>
      nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy("n_regionkey")),

    // U1 — likert dict lookup as a native map-literal + coalesce default-0;
    // replaces the reference's Python UDF (ref utils.py:159-181) with a
    // codegen-friendly expression — no JVM↔Python boundary.
    "u1_likert_map" -> ((s, d) => {
      val m = map(likert.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      orders(s, d).select(
        col("o_orderkey"),
        coalesce(element_at(m, col("o_orderpriority")), lit(0)).as("likert"))
        .orderBy("o_orderkey")
    }),

    // U2 — mojibake repair as nested native regexp_replace
    // (ref utils.py:146-156: 'â€™'→''', 'Ã'→'i'; defined-as-UDF but the
    // reference itself only ever applies the native form)
    "u2_mojibake_repair" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        regexp_replace(
          regexp_replace(concat(col("c_name"), lit("â€™s Ã")), "â€™", "'"),
          "Ã", "i").as("repaired"))
        .orderBy("c_custkey"))
  )

  def oracleSql: Map[String, String] = Map(
    "f01_when_chain" ->
      ("SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' THEN 'AdminOK' " +
        "WHEN o_totalprice < 1000 THEN 'Partial' " +
        "WHEN o_orderstatus = 'P' THEN 'Disqualified' " +
        "WHEN o_orderstatus <> 'O' AND o_orderstatus <> 'F' THEN 'NotComplete' " +
        "WHEN o_orderpriority = '5-LOW' THEN 'TestLink' " +
        "WHEN o_custkey % 100 = 0 THEN 'NonUS' " +
        "ELSE 'Valid' END AS flag FROM orders ORDER BY o_orderkey"),
    "f02_expr_case" ->
      ("SELECT o_orderkey, CASE WHEN o_totalprice >= 200000 THEN 'Overrepresented' " +
        "WHEN o_totalprice <= 50000 THEN 'Underrepresented' " +
        "ELSE 'Within range' END AS rep FROM orders ORDER BY o_orderkey"),
    "f03_coalesce" ->
      ("SELECT o_orderkey, coalesce(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END, " +
        "CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 0.0) AS filled " +
        "FROM orders ORDER BY o_orderkey"),
    "f04_lit" ->
      "SELECT r_regionkey, 'Kingston' AS city, 5 AS domains, 2.5 AS weight FROM region ORDER BY r_regionkey",
    "f05_regexp_nested" ->
      "SELECT p_partkey, regexp_replace(regexp_replace(p_name, '[aeiou]', '', 'g'), ' +', ' ', 'g') AS consonants FROM part ORDER BY p_partkey",
    "f06_case_fns" ->
      "SELECT p_partkey, lower(p_name) AS name_lc, upper(p_brand) AS brand_uc FROM part ORDER BY p_partkey",
    "f07_trim" ->
      "SELECT p_partkey, trim('  ' || p_name || '  ') AS trimmed FROM part ORDER BY p_partkey",
    "f08_concat" ->
      "SELECT p_partkey, p_brand || ' / ' || p_type AS brand_type FROM part ORDER BY p_partkey",
    "f09_substr_cast" ->
      "SELECT c_custkey, CAST(substring(CAST(c_custkey + 1000000 AS VARCHAR), 1, 5) AS INTEGER) AS zip5, try_cast(substring(c_name, 1, 5) AS INTEGER) AS bad_zip FROM customer ORDER BY c_custkey",
    "f10_format_string" ->
      "SELECT c_custkey, printf('%.2f%%', c_acctbal) AS pct_str FROM customer ORDER BY c_custkey",
    "f11_null_phrase_scrub" ->
      ("SELECT c_custkey, CASE WHEN trim(regexp_replace(lower(c_mktsegment), '[^a-zA-Z0-9 ]', '', 'g')) " +
        "IN ('automobile', 'building', 'nada mas que agregarnot really') THEN NULL " +
        "ELSE c_mktsegment END AS segment FROM customer ORDER BY c_custkey"),
    "f12_nan_scrub" ->
      "SELECT c_custkey, CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL ELSE c_mktsegment END AS seg, c_name FROM customer ORDER BY c_custkey",
    "f13_prefix_concat" ->
      "SELECT c_custkey, 'Offline #' || CAST(c_custkey AS VARCHAR) AS offline_id FROM customer ORDER BY c_custkey",
    "f14_to_timestamp" ->
      "SELECT event_id, strptime(strftime(ts, '%m/%d/%Y %I:%M:%S %p'), '%m/%d/%Y %I:%M:%S %p') AS parsed FROM events ORDER BY event_id",
    "f15_unix_ts_diff" ->
      "SELECT event_id, CAST(epoch(date_trunc('second', ts)) - epoch(date_trunc('day', ts)) AS BIGINT) AS secs_into_day FROM events ORDER BY event_id",
    "f16_date_format" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%m/%d/%Y') AS order_dt FROM orders ORDER BY o_orderkey",
    "f18_abs" ->
      "SELECT l_orderkey, l_linenumber, abs(l_quantity - 25) AS qty_dev, abs(l_discount - l_tax) AS rate_gap FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "f19_rowwise_mean" ->
      "SELECT l_orderkey, l_linenumber, round((l_quantity + CAST(l_linenumber AS DOUBLE) + CAST(l_partkey % 10 AS DOUBLE)) / 3, 2) AS row_mean FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "f20_cast" ->
      "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qty_int, CAST(l_orderkey AS VARCHAR) AS key_str, CAST(l_discount AS FLOAT) AS disc_f FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "u1_likert_map" ->
      ("SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' THEN 2 WHEN o_orderpriority = '2-HIGH' THEN 1 " +
        "WHEN o_orderpriority = '3-MEDIUM' THEN 0 WHEN o_orderpriority = '4-NOT SPECIFIED' THEN -1 " +
        "WHEN o_orderpriority = '5-LOW' THEN -2 ELSE 0 END AS likert FROM orders ORDER BY o_orderkey"),
    "u2_mojibake_repair" ->
      "SELECT c_custkey, regexp_replace(regexp_replace(c_name || 'â€™s Ã', 'â€™', '''', 'g'), 'Ã', 'i', 'g') AS repaired FROM customer ORDER BY c_custkey",
    "f21_json_extract" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, " +
        "max(CAST(props->>'$.k' AS BIGINT)) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "f22_from_json" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, " +
        "max(CAST(props->>'$.k' AS BIGINT)) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "f23_null_fns" ->
      ("SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_nz, " +
        "CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 'closed' ELSE 'open' END AS state, " +
        "coalesce(nullif(o_orderpriority, '3-MEDIUM'), '(default)') AS prio_nz " +
        "FROM orders ORDER BY o_orderkey"),
    "f24_string_battery" ->
      ("SELECT c_custkey, split_part(c_name, '#', 2) AS cust_num, " +
        "translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr, " +
        "upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS seg_cap, " +
        "lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad, " +
        "repeat('ab', 3) AS rep, reverse(c_name) AS name_rev, " +
        "CAST(coalesce(position('#' IN c_name), 0) AS BIGINT) AS hash_pos " +
        "FROM customer ORDER BY c_custkey"),
    "f25_collect_sorted" ->
      ("SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations " +
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
  )
}
