package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for q87/q103 (temporary, not part of the suite). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    (Tables.sessionConf ++ Tables.staticConf ++ Tables.scratchDirConf).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    graft.plans.GraftExtensions.register(spark)
    // warm up codegen/IO
    operators.LlmQueries.chainCorpus(spark, sfDir).count()
    for (i <- 1 to 2) {
      println(s"--- iteration $i ---")
      val corpus = operators.LlmQueries.chainCorpus(spark, sfDir)
      time("corpus.count")(corpus.count())
      val labels = time("connectedComponents total")(
        operators.LlmQueries.connectedComponents(corpus))
      time("labels noop")(labels.write.format("noop").mode("overwrite").save())
      // q103 phase split: CC pass vs quality/members vs final argmax
      val q103 = time("qualityKeep build (CC + members checkpoint)")(
        operators.LlmQueries.qualityKeep(corpus))
      time("qualityKeep noop (keepBest agg)")(
        q103.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
