package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a hot key that would pin one task at 100 TB is
  * split at runtime into multiple reader sub-partitions. This is the
  * engine's answer to join skew alongside the manual salting pattern (q59).
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val s = spark
    import s.implicits._
    // one hot key (0) carrying ~all rows, plus a long tail
    val left = s.range(200000L).selectExpr(
      "CASE WHEN id < 190000 THEN 0 ELSE id END AS k", "id AS v")
    val right = s.range(1000L).selectExpr("id AS k", "id * 10 AS w")
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ: broadcast would hide the skew
    val saved = conf.map { case (k, _) => k -> s.conf.getOption(k) }
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val j = left.hint("merge").join(right, "k")
      // execute THIS frame (count() would plan separately and leave this
      // one's adaptive plan un-finalized)
      assert(j.collect().length == 190000) // only the hot key matches the right side
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
