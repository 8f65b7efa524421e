package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query with an optional DuckDB oracle.
  *
  * `build` produces the Spark result for a scale-factor directory; `oracle`
  * is the semantically-equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables. Queries without a SQL-expressible oracle (e.g.
  * approximate MinHash dedup) leave `oracle` empty and get a rows-only check.
  *
  * Oracle-parity rules (see SURVEY.md §7.3):
  *  - every output column aliased identically on both sides;
  *  - no raw timestamps in outputs; integer time arithmetic on events.ts
  *    goes through Tables.tsUsSql (the fixture has shipped ts as both
  *    TIMESTAMP(NANOS)→BIGINT-nanos and TIMESTAMP(MICROS)→TIMESTAMP_NTZ) —
  *    derive epoch integers or formatted strings instead;
  *  - double aggregates routed through exact DECIMAL sums then cast back to
  *    DOUBLE so both engines produce bit-identical values;
  *  - deterministic total ORDER BY with explicit key tie-breaks.
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val build: (SparkSession, String) => DataFrame)
