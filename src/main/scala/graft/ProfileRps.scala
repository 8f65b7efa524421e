package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement tool (not a query path): isolates the consume-path stages
  * behind Bench's pipeline_rps so an rps move can be attributed — the
  * deaggregate UDF+explode, the console projection, and the full chain.
  * Mirrors Bench's synth side exactly; each stage is timed with the noop
  * sink after one untimed warmup pass (JIT/codegen absorption — the rps
  * provenance shows run 1 of a cold path ~3× run 3).
  */
object ProfileRps {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    (Tables.sessionConf ++ Tables.staticConf ++ Tables.scratchDirConf)
      .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val recs = spark.range(n).selectExpr(
      "concat('key', id % 1000) AS partitionKey",
      "cast(concat('payload-', id) AS binary) AS data")
    val framed = streaming.ProduceSink.aggregateRecords(recs, maxPerRecord = 100)
      .withColumn("approximateArrivalTimestamp",
        expr("timestamp_micros(1700000000000000 + CAST(crc32(data) AS BIGINT))"))
      .persist()
    framed.count()
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warmup
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFRPS $name: ${ts.map(t => f"$t%.3f").mkString(" ")} s" +
        f" (best rps ${(n / ts.min).toLong})")
    }
    time("deaggregate only")(operators.RecordPipeline.deaggregate(framed))
    time("deagg+console (full consume)")(
      operators.RecordPipeline.consolePlain(
        operators.RecordPipeline.deaggregate(framed)))
    val deagged = operators.RecordPipeline.deaggregate(framed).persist()
    deagged.count()
    time("console on pre-deagged")(
      operators.RecordPipeline.consolePlain(deagged))
    spark.stop()
  }
}
