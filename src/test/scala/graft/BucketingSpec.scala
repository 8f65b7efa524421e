package graft

/** Bucketing: pre-partitioned storage makes repeated key joins shuffle-free
  * — the 100 TB pattern for fact-fact joins that recur on the same key
  * (write once bucketed by the join key; every later join reads co-located
  * buckets instead of exchanging).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_bucket_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_bucket_b")
    try {
      // force the sort-merge path (broadcast would mask the bucketing)
      val j = spark.table("graft_bucket_a").hint("merge")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle:\n$plan")
      assert(j.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("unbucketed baseline DOES shuffle (the cost bucketing removes)") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    val plan = a.hint("merge").join(b, "k").queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }
}
