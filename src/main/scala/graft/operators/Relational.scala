package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator suite (SURVEY.md §7.2 M2): scans, filters, joins,
  * aggregations, windows, sorts, set ops — all Spark built-ins so Catalyst
  * owns pushdown, join selection (broadcast vs shuffle), partial aggregation
  * and whole-stage codegen. Every query is a pure
  * `(SparkSession, sfDir) => DataFrame` and ships a DuckDB oracle.
  */
object Relational {

  /** Exact decimal sum of a double expression, rounded to cents and
    * returned as DOUBLE.
    *
    * Summing IEEE doubles is order-dependent, and Spark and DuckDB do not
    * add partial aggregates in the same order; routing through DECIMAL makes
    * the sum exact. The final ROUND(, 2) keeps the unscaled value below 2^53
    * so the decimal→double conversion is a single exact-int division —
    * bit-identical on both engines (a scale-10 decimal→double cast is NOT:
    * DuckDB's int128/10^s path double-rounds, off by 1 ulp).
    */
  // Exact SUM → ROUND(,2) → DOUBLE. Since round 14 the sum runs on the
  // fixed-point long kernel (graft.plans.FixedPointSum — two-long buffer,
  // no per-row BigDecimal) instead of SUM(DECIMAL(28,scale)); the values
  // are identical because every call site's input is a fixed-point
  // decimal of ≤ min(scale, 6) true digits (2-dp money columns, integral
  // quantities, and their ≤6-dp products at scale 10), so both forms sum
  // the same exact integers and the oracle's DECIMAL SQL needs no change.
  private[operators] def dsum(c: Column, scale: Int = 2): Column =
    round(graft.plans.FixedPointSum.exact(c, math.min(scale, 6)), 2)
      .cast("double")
  private[operators] def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(ROUND(SUM(CAST($e AS DECIMAL(28,$scale))), 2) AS DOUBLE)"

  private def ntz(s: String): Column = lit(s).cast("timestamp_ntz")

  /** Exact per-window decimal running sum → DOUBLE (same rationale as dsum). */
  private def wsum(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    round(sum(c.cast(DecimalType(28, 2))).over(w), 2).cast("double")

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------- Q1
    // TPC-H Q1 shape: wide hash aggregation with partial (map-side) combine;
    // at 100 TB this is a pure scan + 2-phase agg on ~6 groups — no shuffle
    // pressure, bounded state.
    Q("q1_pricing_summary", Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum("l_extendedprice * (1 - l_discount)", 10)} AS sum_disc_price,
        ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 10)} AS sum_charge,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 10).as("sum_charge"),
          count(lit(1)).as("count_order"))
    },

    // ----------------------------------------------------------------- Q2
    // Filter + projection: both must reach the parquet scan (PushedFilters /
    // ReadSchema) so a 100 TB scan only reads 5 columns and skips row groups.
    Q("q2_filter_project", Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        AND l_quantity < 10
      ORDER BY l_orderkey, l_linenumber""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1998-01-01 00:00:00") &&
          col("l_shipdate") < ntz("1999-01-01 00:00:00") &&
          col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    },

    // ----------------------------------------------------------------- Q3
    // TPC-H Q3 shape: fact-fact shuffle join on l_orderkey. customer is
    // SF-proportional (~1.5M rows/SF) so it gets NO broadcast hint — AQE
    // picks broadcast vs shuffle from measured size at runtime; a forced
    // hint would OOM executors at 100 TB.
    Q("q3_top_revenue", Some(s"""
      SELECT l_orderkey,
        ${sqlDsum("l_extendedprice * (1 - l_discount)", 10)} AS revenue,
        CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")) { (s, dir) =>
      val c = Tables.t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.t(s, dir, "orders").filter(col("o_orderdate") < ntz("1998-07-01 00:00:00"))
      val l = Tables.t(s, dir, "lineitem").filter(col("l_shipdate") > ntz("1998-07-01 00:00:00"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // ----------------------------------------------------------------- Q4
    // Existential semi join (EXISTS): never materializes the probe side.
    Q("q4_priority_exists", Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 48)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1997-01-01 00:00:00") &&
          col("o_orderdate") < ntz("1998-01-01 00:00:00"))
      val l = Tables.t(s, dir, "lineitem").filter(col("l_quantity") > 48)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
    },

    // ----------------------------------------------------------------- Q5
    // TPC-H Q5 shape: 6-way join. Only genuinely bounded dims (nation=25,
    // region=5 rows) carry broadcast hints; customer and supplier are
    // SF-proportional, so their join strategy is left to AQE's measured
    // sizes. Facts shuffle once on orderkey; Catalyst reorders.
    Q("q5_nation_revenue", Some(s"""
      SELECT n_name,
        ${sqlDsum("l_extendedprice * (1 - l_discount)", 10)} AS revenue
      FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name""")) { (s, dir) =>
      // CBO join-reorder is off, so declare the selective order: the ASIA
      // nation set (bounded broadcast) restricts customer AND supplier
      // (~1/5 each) BEFORE any fact join; the 1997 orders (~1/7) join the
      // ASIA customers first, so the one lineitem shuffle probes an
      // orders side already cut ~35×. AQE picks broadcast vs shuffle for
      // the SF-proportional sides by measured size.
      val n = Tables.t(s, dir, "nation")
      val r = Tables.t(s, dir, "region").filter(col("r_name") === "ASIA")
      val asiaN = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      val c = Tables.t(s, dir, "customer")
        .join(asiaN.select(col("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1997-01-01 00:00:00") &&
          col("o_orderdate") < ntz("1998-01-01 00:00:00"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      val su = Tables.t(s, dir, "supplier")
        .join(asiaN.select(col("n_nationkey").as("sn_key"), col("n_name")),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      Tables.t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10).as("revenue"))
    },

    // ----------------------------------------------------------------- Q6
    // TPC-H Q6: pure scan + filter + single global aggregate. The filters
    // must appear in PushedFilters; zero shuffle (one-row partial merge).
    Q("q6_revenue_delta", Some(s"""
      SELECT ${sqlDsum("l_extendedprice * l_discount", 10)} AS revenue,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ntz("1998-01-01 00:00:00") &&
          col("l_shipdate") < ntz("1999-01-01 00:00:00") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 10).as("revenue"),
          count(lit(1)).as("n"))
    },

    // ----------------------------------------------------------------- Q7
    // Anti join (NOT EXISTS): broadcast the aggregated key set when small.
    Q("q7_customers_no_orders", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")) { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // ----------------------------------------------------------------- Q8
    // Left outer join + aggregation, preserving unmatched rows as zero.
    Q("q8_orders_per_customer", Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY n_orders DESC, c_custkey LIMIT 100""")) { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_orders").desc, col("c_custkey")).limit(100)
    },

    // ----------------------------------------------------------------- Q9
    // Top-k per group via a bounded two-phase Aggregator (not a window
    // rank): a window PARTITION BY c_nationkey caps parallelism at 25
    // nations and sorts every customer of a nation in one task. The
    // TopKByValue aggregate keeps ≤3 rows per nation per map task, shuffles
    // only candidates, and merges — scale-safe at any SF. Rank ties are
    // impossible (ordering includes the unique custkey) so rk = position.
    Q("q9_top_customers_by_nation", Some("""
      SELECT * FROM (
        SELECT n_name, c_custkey, c_acctbal,
               RANK() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rk
        FROM customer JOIN nation ON c_nationkey = n_nationkey) t
      WHERE rk <= 3""")) { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
      val n = Tables.t(s, dir, "nation")
      val top3 = udaf(new graft.functions.TopKByValue(3))
      c.groupBy(col("c_nationkey"))
        .agg(top3(col("c_acctbal"), col("c_custkey")).as("top"))
        .select(col("c_nationkey"), posexplode(col("top")).as(Seq("pos", "vk")))
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .select(col("n_name"), col("vk.key").as("c_custkey"),
          col("vk.value").as("c_acctbal"),
          (col("pos") + 1).cast("int").as("rk"))
    },

    // ---------------------------------------------------------------- Q10
    // Running total: cumulative frame, decimal-exact so the incremental
    // sums agree with DuckDB bit-for-bit.
    Q("q10_running_total", Some("""
      SELECT o_custkey, o_orderkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
          AS DOUBLE) AS running_spend
      FROM orders ORDER BY o_custkey, o_orderkey""")) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          wsum(col("o_totalprice"), w).as("running_spend"))
    },

    // ---------------------------------------------------------------- Q11
    // lag/lead over event time. Gaps are compared at MICROSECOND
    // granularity via Tables.tsUsSql (fixture-encoding-proof): under the
    // legacy NANOS fixture Spark read exact nanos while DuckDB quantized to
    // µs, so raw outputs could never hash-match; the µs derivation on the
    // Spark side == epoch_us on the oracle side for both encodings. Window
    // order stays on the raw ts value (no (user_id, ts) ties exist at µs
    // precision, so both orders agree).
    Q("q11_event_lag_lead", Some("""
      SELECT event_id, user_id, value,
        LAG(value)  OVER w AS prev_value,
        LEAD(value) OVER w AS next_value,
        epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""")) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = Tables.t(s, dir, "events")
      val tsUs = expr(Tables.tsUsSql(e))
      e.select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          (tsUs - lag(tsUs, 1).over(w)).as("gap_us"))
    },

    // ---------------------------------------------------------------- Q12
    // Moving average over a bounded row frame; sum/count split keeps the
    // double math to a single division on both engines.
    Q("q12_moving_avg", Some("""
      SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
          / CAST(COUNT(*) OVER w AS DOUBLE) AS mov_avg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      Tables.t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          (sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double") /
            count(lit(1)).over(w).cast("double")).as("mov_avg"))
    },

    // ---------------------------------------------------------------- Q13
    // Global top-k: Spark plans TakeOrderedAndProject — no full sort, each
    // partition keeps k rows, driver merges. The plan that survives 100 TB.
    Q("q13_topk_lineitems", Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    },

    // ---------------------------------------------------------------- Q14
    // Distinct aggregates: Catalyst expands to a two-level aggregate.
    Q("q14_distinct_agg", Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    // ---------------------------------------------------------------- Q15
    // ROLLUP with GROUPING() disambiguators for the null subtotal rows.
    Q("q15_rollup", Some(s"""
      SELECT l_returnflag, l_linestatus,
        GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
        COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty")
    },

    // ---------------------------------------------------------------- Q16
    // CUBE over two order dimensions.
    Q("q16_cube", Some(s"""
      SELECT o_orderstatus, o_orderpriority,
        GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p,
        COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")) { (s, dir) =>
      Tables.t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).as("g_s"),
          grouping(col("o_orderpriority")).as("g_p"),
          count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select("o_orderstatus", "o_orderpriority", "g_s", "g_p", "n", "sum_price")
    },

    // ---------------------------------------------------------------- Q17
    // GROUPING SETS via SQL (the one shape the DataFrame API lacks).
    // PRE-AGGREGATED: Catalyst plans grouping sets as Expand × |sets|
    // BEFORE the aggregate, so the naive form pushed 3× the fact rows
    // (with a decimal sum each) through the partial agg. COUNT and SUM
    // are decomposable, so the fact first collapses to its ~6
    // (flag, status) cells on the fixed-point kernel — one ordinary
    // scan-shaped aggregate — and the Expand multiplies 6 rows, not
    // 30 M (3.0 s → scan cost at sf5). Same trick any cube/rollup over
    // decomposable aggregates admits at 100 TB.
    Q("q17_grouping_sets", Some(s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ${sqlDsum("l_extendedprice")} AS sum_price
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n0"),
          graft.plans.FixedPointSum.exact(col("l_extendedprice"), 2).as("s0"))
        .createOrReplaceTempView("graft_q17_cells")
      s.sql("""
        SELECT l_returnflag, l_linestatus, SUM(n0) AS n,
          CAST(ROUND(SUM(s0), 2) AS DOUBLE) AS sum_price
        FROM graft_q17_cells
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    },

    // ---------------------------------------------------------------- Q18
    // Set operations; SQL precedence (INTERSECT binds first, then
    // left-assoc) mirrored explicitly on the DataFrame side.
    Q("q18_set_ops", Some("""
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders
      UNION
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY custkey""")) { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
      val o = Tables.t(s, dir, "orders")
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val withOrders = o.select(col("o_custkey").as("custkey"))
      val negative = c.filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      val finished = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      building.intersect(withOrders).union(negative).distinct()
        .except(finished)
    },

    // ---------------------------------------------------------------- Q26
    // IN-subquery as a left-semi join (Catalyst plans IN the same way).
    Q("q26_in_subquery", Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      ORDER BY o_orderkey""")) { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") >= ntz("1997-01-01 00:00:00") &&
          col("o_orderdate") < ntz("1998-01-01 00:00:00"))
      val c = Tables.t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // ---------------------------------------------------------------- Q27
    // Correlated scalar subquery (customers above their nation's average)
    // decorrelated into a broadcast join against the per-nation aggregate.
    Q("q27_above_nation_avg", Some("""
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer JOIN (
        SELECT c_nationkey AS nk,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS nation_avg
        FROM customer GROUP BY c_nationkey) a ON c_nationkey = nk
      WHERE c_acctbal > nation_avg
      ORDER BY c_custkey""")) { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
      val avgs = c.groupBy(col("c_nationkey").as("nk"))
        .agg((sum(col("c_acctbal").cast(DecimalType(28, 2))).cast("double") /
          count(lit(1)).cast("double")).as("nation_avg"))
      c.join(broadcast(avgs), c("c_nationkey") === avgs("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    },

    // ---------------------------------------------------------------- Q25
    // HAVING over a grouped aggregate.
    Q("q25_having", Some("""
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
      ORDER BY o_custkey""")) { (s, dir) =>
      Tables.t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 12)
    },

    // ---------------------------------------------------------------- Q24
    // CASE WHEN bucketing + aggregate.
    Q("q24_case_bucket", Some(s"""
      SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                  WHEN o_totalprice < 200000 THEN 'mid'
                  ELSE 'high' END AS bucket,
        COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1 ORDER BY bucket""")) { (s, dir) =>
      Tables.t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 200000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    },

    // ---------------------------------------------------------------- Q28
    // Aggregate + broadcast-joined dimension + HAVING-style filter.
    Q("q28_supplier_breadth", Some("""
      SELECT s_suppkey, s_name, n_parts FROM supplier JOIN (
        SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_suppkey) b ON s_suppkey = l_suppkey
      WHERE n_parts >= 10 ORDER BY s_suppkey""")) { (s, dir) =>
      val su = Tables.t(s, dir, "supplier")
      val breadth = Tables.t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
        .filter(col("n_parts") >= 10)
      // supplier is SF-proportional: no forced broadcast, AQE decides.
      breadth.join(su, col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_parts")
    },

    // ---------------------------------------------------------------- Q29
    // TPC-H Q8-shaped market share: 8-table join (lineitem⋈orders⋈customer⋈
    // nation⋈region ⋈ supplier⋈nation ⋈ part) + per-year share via an exact
    // decimal window sum. Spark ships with CBO join-reorder OFF, so the
    // DECLARED order is the executed order — a left-deep lineitem⋈orders
    // first would shuffle both full facts before any selective filter
    // lands. We declare the selective order instead: p_type='PROMO' (~1/6
    // of parts) and the ASIA customer set (~1/5) reduce EACH fact via
    // dim joins (AQE broadcasts them at measured size — no forced
    // broadcast of SF-proportional tables, so at 100 TB they degrade to
    // shuffles, never driver OOM), leaving ONE fact-fact shuffle on the
    // order key over the 6×/5×-reduced sides.
    Q("q29_market_share", Some("""
      WITH base AS (
        SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
          CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)) AS vol
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'),
      agg AS (
        SELECT o_year, supp_nation, SUM(vol) AS rev FROM base GROUP BY 1, 2)
      SELECT o_year, supp_nation,
        CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
        round(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY o_year) AS DOUBLE), 6) AS share
      FROM agg""")) { (s, dir) =>
      def t(n: String) = Tables.t(s, dir, n)
      // ASIA customer keys: bounded nation⋈region broadcast, then the
      // SF-proportional customer projection (2 cols survive the scan).
      val asiaNationKeys = t("nation").as("n1")
        .join(t("region"), col("n1.n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select(col("n1.n_nationkey"))
      val custF = t("customer")
        .join(asiaNationKeys, col("c_nationkey") === col("n1.n_nationkey"))
        .select(col("c_custkey"))
      val ordersF = t("orders")
        .join(custF, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val suppNation = t("supplier")
        .join(t("nation").as("n2"), col("s_nationkey") === col("n2.n_nationkey"))
        .select(col("s_suppkey"), col("n2.n_name").as("supp_nation"))
      val partF = t("part").where(col("p_type") === "PROMO").select(col("p_partkey"))
      val base = t("lineitem")
        .join(partF, col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("supp_nation"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(28, 10)).as("vol"))
        .join(ordersF, col("l_orderkey") === col("o_orderkey"))
      val agg = base.groupBy("o_year", "supp_nation").agg(sum("vol").as("rev"))
      agg.select(col("o_year"), col("supp_nation"),
        round(col("rev"), 2).cast("double").as("revenue"),
        round(col("rev").cast("double") /
          sum("rev").over(org.apache.spark.sql.expressions.Window
            .partitionBy("o_year")).cast("double"), 6).as("share"))
    }
  )
}
