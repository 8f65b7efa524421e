package graft

/** Contract tests for [[Bounded]] — the round-15 driver-fetch guard that
  * PlanAuditSpec's source audit forces all operator code through.
  */
class BoundedSpec extends SparkSpec {
  import spark.implicits._

  test("collect returns all rows of an in-cap frame, in full") {
    val got = Bounded.collect((1 to 10).toDF("x"), cap = 10, what = "ten rows")
    assert(got.map(_.getInt(0)).sorted.toSeq == (1 to 10))
  }

  test("collect THROWS on a frame exceeding its declared cap, naming the culprit") {
    val e = intercept[IllegalArgumentException] {
      Bounded.collect(spark.range(1000).toDF(), cap = 99, what = "audit me")
    }
    assert(e.getMessage.contains("audit me"))
    assert(e.getMessage.contains("99"))
  }

  test("collect never materializes far past the cap (take semantics)") {
    // a frame of 10M rows with cap 5 must fail fast, not OOM-collect:
    // take(cap+1) fetches at most a handful of partitions
    val e = intercept[IllegalArgumentException] {
      Bounded.collect(spark.range(10000000L).toDF(), cap = 5, what = "huge")
    }
    assert(e.getMessage.contains("huge"))
  }

  test("one returns the single row of a 1-row frame and rejects 0 or 2+") {
    import org.apache.spark.sql.functions._
    assert(Bounded.one(spark.range(5).agg(sum("id")), "sum").getLong(0) == 10L)
    val none = intercept[IllegalArgumentException] {
      Bounded.one(spark.range(5).filter(col("id") > 100), "empty")
    }
    assert(none.getMessage.contains("empty"))
    val many = intercept[IllegalArgumentException] {
      Bounded.one(spark.range(5), "too many")
    }
    assert(many.getMessage.contains("too many"))
  }

  test("collectRdd enforces the cap on the RDD path") {
    val sc = spark.sparkContext
    assert(Bounded.collectRdd(sc.parallelize(1 to 7), 7, "rdd ok").sorted.toSeq == (1 to 7))
    val e = intercept[IllegalArgumentException] {
      Bounded.collectRdd(sc.parallelize(1 to 100), 7, "rdd over")
    }
    assert(e.getMessage.contains("rdd over"))
  }
}
