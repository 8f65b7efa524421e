package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-milestone registries; each registry
  * entry is a [[Q]] carrying the Spark builder and (where SQL-expressible)
  * its DuckDB oracle.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    operators.Relational.all ++ functions.ScalarQueries.all ++
      operators.RecordQueries.all ++ operators.LlmQueries.all ++
      streaming.WindowQueries.all ++ operators.AdvancedQueries.all ++
      operators.Multimodal.all ++ operators.StatsQueries.all ++
      operators.VectorQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.sessionConf.foreach { case (k, v) => spark.conf.set(k, v) }
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
