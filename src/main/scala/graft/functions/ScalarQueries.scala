package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function coverage batch (SURVEY.md §7.2 M2): string, date, math,
  * array and JSON functions — all codegen'd built-ins, zero UDFs, so every
  * expression stays inside whole-stage codegen.
  *
  * Oracle-parity notes:
  *  - ln/sqrt are the only transcendentals; sqrt is IEEE-correctly-rounded
  *    (identical everywhere) and ln is rounded to 6 dp (1-ulp libm skew vs a
  *    1e-6 grid is a ~1e-9 collision risk);
  *  - round(double, k) is avoided on money columns — Spark rounds the
  *    shortest decimal representation, DuckDB rescales in binary, and they
  *    disagree on midpoints; decimal casts are used instead (see
  *    Relational.dsum);
  *  - arrays are emitted as joined strings so the driver's value hash never
  *    sees a nested type.
  */
object ScalarQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- Q19
    Q("q19_string_funcs", Some("""
      SELECT p_partkey,
        upper(p_name) AS up, lower(p_brand) AS lo,
        CAST(length(p_name) AS BIGINT) AS len,
        substring(p_name, 1, 5) AS pre,
        replace(p_name, ' ', '_') AS snake,
        split_part(p_name, ' ', 1) AS tok1,
        regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        concat(p_type, ':', p_brand) AS typed_brand,
        contains(p_name, 'red') AS has_red,
        starts_with(p_type, 'ECO') AS is_eco,
        CAST(levenshtein(p_name, 'red widget') AS BIGINT) AS lev
      FROM part ORDER BY p_partkey""")) { (s, dir) =>
      Tables.t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 5).as("pre"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        split_part(col("p_name"), lit(" "), lit(1)).as("tok1"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        concat(col("p_type"), lit(":"), col("p_brand")).as("typed_brand"),
        col("p_name").contains("red").as("has_red"),
        col("p_type").startsWith("ECO").as("is_eco"),
        levenshtein(col("p_name"), lit("red widget")).cast("long").as("lev"))
    },

    // ---------------------------------------------------------------- Q20
    Q("q20_date_funcs", Some("""
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT)    AS y,
        CAST(month(o_orderdate) AS INT)   AS m,
        CAST(day(o_orderdate) AS INT)     AS d,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        CAST(o_orderdate AS DATE) + 30 AS plus_30,
        last_day(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders ORDER BY o_orderkey""")) { (s, dir) =>
      Tables.t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus_30"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
    },

    // ---------------------------------------------------------------- Q21
    Q("q21_math_funcs", Some("""
      SELECT l_orderkey, l_linenumber,
        abs(l_quantity - 25)                        AS dist25,
        CAST(ceil(l_extendedprice)  AS BIGINT)      AS price_ceil,
        CAST(floor(l_extendedprice) AS BIGINT)      AS price_floor,
        sqrt(l_extendedprice)                       AS price_sqrt,
        round(ln(l_extendedprice + 1), 6)           AS price_ln,
        l_quantity * l_quantity                     AS qty_sq,
        CAST(l_quantity AS BIGINT) % 7              AS qty_mod,
        greatest(l_quantity, l_discount * 100)      AS g,
        least(l_tax, l_discount)                    AS l
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber LIMIT 5000""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("dist25"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        round(log(col("l_extendedprice") + 1), 6).as("price_ln"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        (col("l_quantity").cast("long") % 7).as("qty_mod"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"))
        .orderBy("l_orderkey", "l_linenumber").limit(5000)
    },

    // ---------------------------------------------------------------- Q22
    // Array higher-order functions over tokenized document text.
    Q("q22_array_funcs", Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        string_split(text, ' ')[1] AS first_tok,
        list_contains(string_split(text, ' '), 'table') AS has_table,
        array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS sorted3,
        CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS char_sum,
        COALESCE(array_to_string(list_filter(string_split(text, ' '), t -> length(t) > 5), ','), '') AS long_toks
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val toks = split(col("text"), " ")
      Tables.t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        try_element_at(toks, lit(1)).as("first_tok"),
        array_contains(toks, "table").as("has_table"),
        array_join(slice(array_sort(toks), 1, 3), ",").as("sorted3"),
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
          (acc, x) => acc + x).as("char_sum"),
        array_join(filter(toks, t => length(t) > 5), ",").as("long_toks"))
    },

    // ---------------------------------------------------------------- Q63
    // Ranking-window suite: row_number / dense_rank / ntile / percent_rank /
    // cume_dist / first_value / nth_value, one shuffle on the partition key.
    Q("q63_window_suite", Some("""
      SELECT o_orderkey, o_custkey,
        row_number() OVER w AS rn,
        dense_rank() OVER w AS dr,
        ntile(4) OVER w AS nt,
        round(percent_rank() OVER w, 6) AS pr,
        round(cume_dist() OVER w, 6) AS cd,
        first_value(o_orderkey) OVER w AS fv,
        nth_value(o_orderkey, 2) OVER w AS nv
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(w).cast("long").as("rn"),
        dense_rank().over(w).cast("long").as("dr"),
        ntile(4).over(w).cast("long").as("nt"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        first_value(col("o_orderkey")).over(w).as("fv"),
        nth_value(col("o_orderkey"), 2).over(w).as("nv"))
    },

    // ---------------------------------------------------------------- Q64
    // String/conditional batch two: translate, reverse, pad, repeat,
    // ascii/chr, left/right, nullif/coalesce.
    Q("q64_string_cond_funcs", Some("""
      SELECT p_partkey,
        translate(p_name, 'aeiou', 'AEIOU') AS de_voweled,
        reverse(p_brand) AS rev,
        lpad(p_brand, 12, '*') AS lp,
        rpad(p_brand, 12, '*') AS rp,
        repeat(p_type, 2) AS rep2,
        CAST(ascii(p_name) AS INT) AS first_code,
        chr(65 + p_size % 26) AS size_letter,
        left(p_name, 4) AS l4,
        right(p_name, 4) AS r4,
        CAST(nullif(p_size, 10) AS INT) AS size_not10,
        CAST(coalesce(nullif(p_size, 10), -1) AS INT) AS size_or_neg1
      FROM part""")) { (s, dir) =>
      Tables.t(s, dir, "part").select(
        col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("de_voweled"),
        reverse(col("p_brand")).as("rev"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "*").as("rp"),
        repeat(col("p_type"), 2).as("rep2"),
        ascii(col("p_name")).as("first_code"),
        chr(lit(65) + col("p_size") % 26).as("size_letter"),
        expr("left(p_name, 4)").as("l4"),
        expr("right(p_name, 4)").as("r4"),
        nullif(col("p_size"), lit(10)).as("size_not10"),
        coalesce(nullif(col("p_size"), lit(10)), lit(-1)).as("size_or_neg1"))
    },

    // ---------------------------------------------------------------- Q65
    // Date batch two: month arithmetic with end-of-month clamping (Spark
    // add_months == DuckDB +INTERVAL), ISO day-of-week/week-of-year,
    // quarter truncation.
    Q("q65_date_arith", Some("""
      SELECT o_orderkey,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        CAST(dayofyear(o_orderdate) AS INT) AS doy,
        CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
        last_day(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH) AS next_month_end
      FROM orders""")) { (s, dir) =>
      Tables.t(s, dir, "orders").select(
        col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        (weekday(col("o_orderdate")) + 1).as("iso_dow"),
        date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"),
        last_day(add_months(col("o_orderdate").cast("date"), 1)).as("next_month_end"))
    },

    // ---------------------------------------------------------------- Q23
    // JSON extraction from the events.props column.
    Q("q23_json_funcs", Some("""
      SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
      FROM events ORDER BY event_id""")) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k")
      Tables.t(s, dir, "events").select(
        col("event_id"),
        k.as("k_str"),
        k.cast("long").as("k_val"),
        (k.cast("long") % 10).as("k_mod"))
    },

    // ---------------------------------------------------------------- Q80
    // Bitwise / integer-exact function batch: AND/OR/XOR, shifts, popcount,
    // modulo — pure integer arithmetic, so cross-engine parity is exact by
    // construction (no rounding anywhere). Syntax differs (DuckDB spells
    // XOR `xor()` — its `^` is exponentiation — and shifts as `<<`), the
    // semantics are identical.
    Q("q80_bitwise_funcs", Some("""
      SELECT l_orderkey, l_partkey,
        l_orderkey & l_partkey                  AS band,
        l_orderkey | l_partkey                  AS bor,
        xor(l_orderkey, l_partkey)              AS bxor,
        CAST(l_linenumber << 3 AS INT)          AS shl,
        CAST(l_orderkey >> 2 AS BIGINT)         AS shr,
        CAST(bit_count(l_orderkey) AS INT)      AS pop,
        l_orderkey % 97                         AS m
      FROM lineitem WHERE l_linenumber = 1""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .where(col("l_linenumber") === 1)
        .selectExpr("l_orderkey", "l_partkey",
          "l_orderkey & l_partkey AS band",
          "l_orderkey | l_partkey AS bor",
          "l_orderkey ^ l_partkey AS bxor",
          "CAST(shiftleft(l_linenumber, 3) AS INT) AS shl",
          "CAST(shiftright(l_orderkey, 2) AS BIGINT) AS shr",
          "CAST(bit_count(l_orderkey) AS INT) AS pop",
          "l_orderkey % 97 AS m")
    },

    // ---------------------------------------------------------------- Q84
    // Regexp batch: extract-all (joined to a string for the checker),
    // global replace (DuckDB needs the 'g' flag; Spark replaces all by
    // default), boolean match, and first-group extract — the text-cleaning
    // primitives of a document pipeline.
    Q("q84_regex_funcs", Some("""
      SELECT doc_id,
        COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{7,}'), '|'), '')
          AS long_words,
        regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled,
        regexp_matches(text, '[0-9]') AS has_digit,
        regexp_extract(text, '([a-z]+)', 1) AS first_word
      FROM documents""")) { (s, dir) =>
      Tables.t(s, dir, "documents").selectExpr("doc_id",
        // COALESCE on BOTH sides: DuckDB's array_to_string of an empty list
        // is NULL (hence its COALESCE), and a NULL text row must also agree
        // — Spark's array_join(NULL) is NULL, DuckDB's COALESCE would make
        // it '', so mirror the guard here for null-input symmetry.
        "COALESCE(array_join(regexp_extract_all(text, '[a-z]{7,}', 0), '|'), '') AS long_words",
        "regexp_replace(substr(text, 1, 40), '[aeiou]', '_') AS devoweled",
        "text RLIKE '[0-9]' AS has_digit",
        "regexp_extract(text, '([a-z]+)', 1) AS first_word")
    }
  )
}
