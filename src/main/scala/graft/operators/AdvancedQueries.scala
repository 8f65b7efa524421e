package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced relational operators beyond the core M2 suite: as-of join,
  * range join, pivot, UDTF-shaped explode, map functions, exact
  * percentiles. Each has a DuckDB oracle (ASOF JOIN is native there, which
  * makes it a strong independent check of the Spark formulation).
  */
object AdvancedQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- Q53
    // AS-OF JOIN: for every event, the user's most recent order at or
    // before the event time. Spark has no native as-of join; the scale-safe
    // formulation is the union-merge: tag both inputs, shuffle ONCE on the
    // key, sort within partition by (time, tag), and carry the latest order
    // forward with last_value(ignoreNulls). That is the textbook
    // distributed as-of merge — one shuffle, one partition-local sort, no
    // range explosion, works at any SF. The oracle is DuckDB's native
    // `ASOF LEFT JOIN` (ties on order time pre-collapsed to max orderkey,
    // since the reference semantics of "which order at exactly t" would
    // otherwise be engine-defined).
    Q("q53_asof_join", Some("""
      WITH od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                  FROM orders GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, od.o_orderkey AS last_orderkey,
             epoch_us(od.o_orderdate) AS last_orderdate_us
      FROM events e ASOF LEFT JOIN od
        ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate""")) { (s, dir) =>
      val od = Tables.t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      val orderSide = od.select(
        col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        lit(0).as("is_event"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      val ev = Tables.t(s, dir, "events")
      val eventSide = ev.select(
        col("user_id"),
        expr(Tables.tsUsSql(ev)).as("t"),
        lit(1).as("is_event"),
        col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("long").as("od_us"))
      // at equal t the order row sorts first (is_event 0 < 1) so `>=`
      // includes an order placed exactly at the event timestamp
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_event"))
        .rowsBetween(Window.unboundedPreceding, 0)
      orderSide.unionByName(eventSide)
        .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("last_orderdate_us", last(col("od_us"), ignoreNulls = true).over(w))
        .filter(col("is_event") === 1)
        .select("event_id", "user_id", "last_orderkey", "last_orderdate_us")
    },

    // ---------------------------------------------------------------- Q54
    // Range join: price-band classification via a non-equi join against a
    // literal band table. The band side is bounded by construction →
    // broadcast nested-loop with an interval predicate; at scale this stays
    // a broadcast (bands are static metadata), never a cross product.
    Q("q54_range_join", Some(s"""
      WITH bands AS (SELECT * FROM (VALUES
          ('b0_under25k',   0.0,  25000.0),
          ('b1_25to50k', 25000.0, 50000.0),
          ('b2_50to75k', 50000.0, 75000.0),
          ('b3_75kplus', 75000.0, 1e18)) t(band, lo, hi))
      SELECT band, COUNT(*) AS n,
        ${Relational.sqlDsum("l_extendedprice")} AS sum_price
      FROM lineitem JOIN bands
        ON l_extendedprice >= lo AND l_extendedprice < hi
      GROUP BY band""")) { (s, dir) =>
      import s.implicits._
      val bands = Seq(
        ("b0_under25k", 0.0, 25000.0),
        ("b1_25to50k", 25000.0, 50000.0),
        ("b2_50to75k", 50000.0, 75000.0),
        ("b3_75kplus", 75000.0, 1e18)).toDF("band", "lo", "hi")
      Tables.t(s, dir, "lineitem").select("l_extendedprice")
        .join(broadcast(bands),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), Relational.dsum(col("l_extendedprice")).as("sum_price"))
    },

    // ---------------------------------------------------------------- Q55
    // Pivot: order counts and exact sums per status × priority. Spark's
    // relational pivot compiles to one hash aggregation with a conditional
    // agg per pivot value (the oracle spells those FILTER clauses out).
    Q("q55_pivot", Some("""
      SELECT o_orderstatus,
        COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent_n,
        COUNT(*) FILTER (o_orderpriority = '5-LOW')    AS low_n,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
          FILTER (o_orderpriority = '1-URGENT'), 2) AS DOUBLE) AS urgent_sum,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
          FILTER (o_orderpriority = '5-LOW'), 2) AS DOUBLE)    AS low_sum
      FROM orders GROUP BY o_orderstatus""")) { (s, dir) =>
      val p = Tables.t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq("1-URGENT", "5-LOW"))
        .agg(count(lit(1)).as("n"), Relational.dsum(col("o_totalprice")).as("sum"))
      p.select(col("o_orderstatus"),
        col("1-URGENT_n").as("urgent_n"), col("5-LOW_n").as("low_n"),
        col("1-URGENT_sum").as("urgent_sum"), col("5-LOW_sum").as("low_sum"))
    },

    // ---------------------------------------------------------------- Q56
    // UDTF surface: posexplode of the token array with 1-based positions —
    // the Generate operator (same machinery the KPL de-aggregation rides).
    Q("q56_posexplode", Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
                 WHERE doc_id < 50)
      SELECT doc_id, u.s.pos AS pos, u.s.tok AS tok
      FROM (SELECT doc_id,
              [{'tok': toks[i], 'pos': i} for i in range(1, len(toks) + 1)] AS ss
            FROM t), unnest(ss) AS u(s)""")) { (s, dir) =>
      Tables.t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    },

    // ---------------------------------------------------------------- Q57
    // Map functions: build token→length maps, extract keys/values. Keys are
    // the first 5 SORTED distinct tokens — DuckDB's list_distinct does not
    // preserve first-occurrence order, so ordering must be imposed before
    // slicing. (DuckDB map extraction returns a single-element list — [1].)
    Q("q57_map_funcs", Some("""
      WITH t AS (SELECT doc_id, list_sort(list_distinct(string_split(text, ' ')))[1:5] AS ks
                 FROM documents)
      SELECT doc_id,
        CAST(cardinality(map(ks, [length(k) for k in ks])) AS INT) AS n_keys,
        array_to_string(list_sort(map_keys(map(ks, [length(k) for k in ks]))), ',') AS keys_sorted,
        CAST(map(ks, [length(k) for k in ks])[ks[1]][1] AS INT) AS first_val
      FROM t""")) { (s, dir) =>
      Tables.t(s, dir, "documents")
        .selectExpr("doc_id", "slice(array_sort(array_distinct(split(text, ' '))), 1, 5) AS ks")
        .selectExpr("doc_id", "map_from_arrays(ks, transform(ks, k -> length(k))) AS m", "ks")
        .selectExpr("doc_id",
          "size(m) AS n_keys",
          "array_join(array_sort(map_keys(m)), ',') AS keys_sorted",
          "element_at(m, element_at(ks, 1)) AS first_val")
    },

    // ---------------------------------------------------------------- Q58
    // Exact percentiles with linear interpolation — Spark `percentile` and
    // DuckDB `quantile_cont` share the (1-h)·lo + h·hi definition; rounded
    // to 6 dp to absorb any final-ulp skew.
    Q("q58_percentiles", Some("""
      SELECT l_returnflag,
        round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        round(quantile_cont(l_extendedprice, 0.5),  6) AS p50,
        round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
      FROM lineitem GROUP BY l_returnflag""")) { (s, dir) =>
      // exact quantiles via StatsQueries.exactGroupPercentiles (range-
      // partitioned rank selection, bit-equal to the builtin percentile
      // but with no per-group reducer buffering — see q86)
      import s.implicits._
      val pcts = StatsQueries.exactGroupPercentiles(
        Tables.t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.75))
      pcts.keys.map(_._1).toSeq.distinct.sorted
        .map(g => (g, pcts((g, 0.25)), pcts((g, 0.5)), pcts((g, 0.75))))
        .toDF("l_returnflag", "p25r", "p50r", "p75r")
        .select(col("l_returnflag"),
          round(col("p25r"), 6).as("p25"),
          round(col("p50r"), 6).as("p50"),
          round(col("p75r"), 6).as("p75"))
    },

    // ---------------------------------------------------------------- Q68
    // Bag (multiset) set-ops: EXCEPT ALL / INTERSECT ALL keep duplicate
    // multiplicity (the DISTINCT variants are q18), plus null-safe equality
    // semantics — the orderpriority column is nulled for '3-MEDIUM' rows so
    // NULL rows must match each other under bag semantics.
    Q("q68_bag_set_ops", Some("""
      WITH a AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS p FROM orders
                 WHERE o_orderstatus = 'F'),
           b AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS p FROM orders
                 WHERE o_totalprice > 150000)
      SELECT 'except_all' AS op, p, COUNT(*) AS n
      FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b) GROUP BY p
      UNION ALL
      SELECT 'intersect_all', p, COUNT(*)
      FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b) GROUP BY p""")) { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F")
        .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("p"))
      val b = o.filter(col("o_totalprice") > 150000)
        .select(nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("p"))
      val ex = a.exceptAll(b).groupBy(col("p"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      val in = a.intersectAll(b).groupBy(col("p"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      ex.unionByName(in).select("op", "p", "n")
    },

    // ---------------------------------------------------------------- Q69
    // Ordered string aggregation: listagg-style CSV per group. Spark builds
    // it as sort_array(collect_list) + array_join — collect_list order is
    // nondeterministic, so the sort is what makes the result stable and
    // oracle-comparable (DuckDB string_agg with ORDER BY).
    Q("q69_string_agg", Some("""
      SELECT l_returnflag,
        string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        string_agg(DISTINCT CAST(l_linenumber AS VARCHAR), ','
                   ORDER BY CAST(l_linenumber AS VARCHAR)) AS linenos
      FROM lineitem GROUP BY l_returnflag""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
          array_join(array_sort(collect_set(col("l_linenumber").cast("string"))), ",")
            .as("linenos"))
    },

    // ---------------------------------------------------------------- Q59
    // Salted aggregation — the skew pattern: l_returnflag has only 3 values,
    // so a naive exact-distinct per flag funnels everything into 3 reducers.
    // Phase 1 aggregates on (flag, salt16) — 48 partial groups spread across
    // the cluster — phase 2 merges the 16 salted partials per flag. The salt
    // is pmod(hash(row-key), 16): internal only, never in the output, so
    // results are deterministic and the oracle is the plain GROUP BY. (For
    // the count-distinct, salting BY THE DISTINCT KEY keeps it exact: equal
    // keys land in the same salt bucket.)
    Q("q59_salted_agg", Some(s"""
      SELECT l_returnflag, COUNT(*) AS n,
        COUNT(DISTINCT l_partkey) AS n_parts,
        ${Relational.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_returnflag""")) { (s, dir) =>
      val salted = Tables.t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey"),
          col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(28, 2)).as("qty"),
          pmod(hash(col("l_partkey")), lit(16)).as("salt"))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          countDistinct(col("l_partkey")).as("pparts"),
          sum(col("qty")).as("pqty"))
      salted.groupBy(col("l_returnflag"))
        .agg(sum(col("pn")).as("n"),
          sum(col("pparts")).as("n_parts"),
          round(sum(col("pqty")), 2).cast("double").as("sum_qty"))
    }
  )
}
