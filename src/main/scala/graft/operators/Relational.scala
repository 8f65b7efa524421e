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
  private[operators] def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(28, scale))), 2).cast("double")
  private[operators] def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(ROUND(SUM(CAST($e AS DECIMAL(28,$scale))), 2) AS DOUBLE)"

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
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )
}
