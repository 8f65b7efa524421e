package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format coverage beyond the parquet fixtures: CSV and JSON
  * round-trips preserve values, and partitioned parquet writes prune
  * partitions at read time (the lakehouse layout a 100 TB deployment uses —
  * partition pruning turns a full scan into a directory listing).
  */
class SourcesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  test("CSV round-trip preserves rows and values (header + explicit schema)") {
    val dir = tmp()
    val in = Tables.t(spark, sf, "nation")
    in.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true").schema(in.schema).csv(dir)
    assert(back.collect().toSet == in.collect().toSet)
  }

  test("JSON lines round-trip preserves rows and values") {
    val dir = tmp()
    val in = Tables.t(spark, sf, "customer")
    in.write.mode("overwrite").json(dir)
    val back = spark.read.schema(in.schema).json(dir)
    assert(back.count() == in.count())
    assert(back.agg(sum("c_acctbal")).head.getDouble(0) ==
      in.agg(sum("c_acctbal")).head.getDouble(0))
  }

  test("partitioned parquet write prunes partitions on filtered read") {
    val dir = tmp()
    Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val filtered = spark.read.parquet(dir).where(col("o_year") === 1995)
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), s"no partition filters:\n$scan")
    val wanted = Tables.t(spark, sf, "orders")
      .where(year(col("o_orderdate")) === 1995).count()
    assert(filtered.count() == wanted)
  }

  test("ORC round-trip preserves rows and values, with filter pushdown") {
    val dir = tmp()
    val in = Tables.t(spark, sf, "supplier")
    in.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().toSet == in.collect().toSet)
    val filtered = back.where(col("s_nationkey") === 3)
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") && scan.contains("s_nationkey"),
      s"ORC scan must push the filter:\n$scan")
  }

  test("malformed CSV records: PERMISSIVE nulls, DROPMALFORMED drops, FAILFAST throws") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(dir, "in.csv"),
      "1,alpha\n2,beta\nnot-a-number,gamma\n3,delta\n".getBytes("UTF-8"))
    val schema = "id INT, name STRING"
    def read(mode: String) =
      spark.read.schema(schema).option("mode", mode).csv(dir)
    assert(read("PERMISSIVE").where(col("id").isNull).count() == 1)
    // collect, not count: count() skips column parsing entirely, so
    // malformed rows are never detected and nothing is dropped
    assert(read("DROPMALFORMED").collect().length == 3)
    intercept[Exception] { read("FAILFAST").collect() }
  }

  test("text source is one row per newline-delimited line (A1 parity)") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(dir, "in.txt"),
      "line one\nline two\nline three\n".getBytes("UTF-8"))
    val lines = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(lines.sameElements(Array("line one", "line three", "line two")))
  }
}
