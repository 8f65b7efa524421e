package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * All tables are plain parquet scans so Catalyst pushes filters and prunes
  * columns straight into the file scan; at cluster scale these would be the
  * same `spark.read.parquet` over a partitioned data lake path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session options every graft entry point needs:
    *  - UTC so naive parquet timestamps agree with the DuckDB oracle;
    *  - nanosAsLong because events.ts is TIMESTAMP(NANOS) which Spark cannot
    *    represent (SPARK-40819): it arrives as BIGINT nanoseconds.
    */
  val sessionConf: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true")
}
