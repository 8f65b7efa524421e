package graft

import org.apache.spark.sql.functions._

/** Pins [[operators.StatsQueries.exactGroupPercentiles]] — the
  * range-partitioned selection pass that q86 runs instead of the builtin
  * `percentile` aggregate — BIT-equal to the builtin on every probed
  * quantile. If the selection misses a rank, mis-offsets a partition, or
  * interpolates in a different op order, these comparisons fail on exact
  * Double equality, not a tolerance.
  */
class ExactPercentileSpec extends SparkSpec {

  private val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def builtin(df: org.apache.spark.sql.DataFrame, g: String,
      v: String): Map[(String, Double), Double] =
    df.groupBy(col(g).cast("string").as("g"))
      .agg(expr(s"percentile(CAST($v AS DOUBLE), ${ps.head})").as("p0"),
        ps.tail.map(p => expr(s"percentile(CAST($v AS DOUBLE), $p)").as(s"p$p")): _*)
      .collect()
      .flatMap(r => ps.zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getDouble(i + 1)
      }).toMap

  test("selection pass is bit-equal to builtin percentile on lineitem") {
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val got = operators.StatsQueries.exactGroupPercentiles(
      li, "l_returnflag", "l_extendedprice", ps)
    val want = builtin(li, "l_returnflag", "l_extendedprice")
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(got(k) == want(k), s"$k: got ${got(k)} want ${want(k)}")
  }

  test("selection pass survives ties, singletons, and tiny groups") {
    import spark.implicits._
    // adversarial: a 1-row group, a 2-row group, a group that is one
    // giant tie run, a group with ties straddling likely partition
    // boundaries, and negative values
    val rows =
      Seq(("one", 42.0)) ++
      Seq(("two", 1.0), ("two", 2.0)) ++
      (1 to 500).map(_ => ("tie", 7.5)) ++
      (1 to 300).flatMap(i => Seq(("mix", (i % 10).toDouble), ("mix", -1.0))) ++
      (1 to 97).map(i => ("odd", i.toDouble * 1.7 - 50))
    val df = rows.toDF("g", "v").repartition(13) // scramble input layout
    val got = operators.StatsQueries.exactGroupPercentiles(df, "g", "v", ps)
    val want = builtin(df, "g", "v")
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(got(k) == want(k), s"$k: got ${got(k)} want ${want(k)}")
  }

  test("robustStats matches the builtin two-pass formulation bit-for-bit") {
    import spark.implicits._
    // same adversarial shapes as above, plus a bimodal group (two tight
    // clusters far apart) that drives the r13 bucket refinement through
    // its rank-straddle short-circuit, and an even-count group whose MAD
    // interpolates between two distinct deviations
    val rows =
      Seq(("one", 42.0)) ++
      Seq(("two", 1.0), ("two", 2.0)) ++
      (1 to 500).map(_ => ("tie", 7.5)) ++
      (1 to 300).flatMap(i => Seq(("mix", (i % 10).toDouble), ("mix", -1.0))) ++
      (1 to 97).map(i => ("odd", i.toDouble * 1.7 - 50)) ++
      (1 to 200).map(i => ("bim", if (i % 2 == 0) 0.0 else 1e9)) ++
      (1 to 96).map(i => ("evn", i.toDouble * i * 0.37)) ++
      // 1..200: the MAD's interpolation ranks 99/100 land on deviations
      // 49.5 and 50.5 — adjacent d-clusters in different buckets, the
      // guaranteed straddle case
      (1 to 200).map(i => ("rng", i.toDouble))
    val df = rows.toDF("g", "v").repartition(13)
    val got = operators.StatsQueries.robustStats(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val med = df.groupBy("g").agg(
      round(expr("percentile(v, 0.5D)"), 6).as("med"),
      round(expr("percentile(v, 0.25D)"), 6).as("p25"),
      round(expr("percentile(v, 0.75D)"), 6).as("p75"))
    val want = df.join(med, "g").groupBy("g", "med", "p25", "p75")
      .agg(round(expr("percentile(abs(v - med), 0.5D)"), 6).as("mad"),
        sum(when(col("v") > col("p75") + (col("p75") - col("p25")) * 1.5 ||
          col("v") < col("p25") - (col("p75") - col("p25")) * 1.5, 1L)
          .otherwise(0L)).as("n_out"))
      .select(col("g"), col("med"),
        round(col("p75") - col("p25"), 6).as("iqr"), col("mad"), col("n_out"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet)
      assert(got(g) == want(g), s"$g: got ${got(g)} want ${want(g)}")
  }

  test("NULL values are skipped exactly like the builtin") {
    import spark.implicits._
    // nulls interleaved through a group must not shift rank offsets or
    // break the typed decode; the builtin silently drops them, so the
    // selection pass must rank only the non-null stream
    val rows: Seq[(String, java.lang.Double)] =
      (1 to 200).flatMap { i =>
        Seq(("a", java.lang.Double.valueOf(i.toDouble)),
          ("a", null: java.lang.Double))
      } ++ Seq(("b", java.lang.Double.valueOf(3.0)),
        ("b", null: java.lang.Double), ("b", java.lang.Double.valueOf(9.0)))
    val df = rows.toDF("g", "v").repartition(7)
    val got = operators.StatsQueries.exactGroupPercentiles(df, "g", "v", ps)
    val want = builtin(df, "g", "v")
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(got(k) == want(k), s"$k: got ${got(k)} want ${want(k)}")
  }

  test("log-uniform 300-decade distribution resolves via the sort fallback, bit-equal to builtin") {
    // ADVICE r13: linear bucketing shrinks the VALUE range 8192× per
    // level, but this stream is log-uniform over ~300 decades — each
    // level sheds only ~log10(8192) ≈ 3.9 decades of rows, so the
    // median's bracket still holds far more than RankCollectCap rows when
    // the level budget runs out (the r13 require() threw here). 400k rows
    // at x_i = 10^(-300·i/n) forces exactly that regime; the bracket-
    // scoped sort fallback must resolve it to the builtin's exact bits.
    val n = 400000
    val df = spark.range(n).selectExpr("'a' AS g",
      s"power(10.0, -300.0 * CAST(id AS DOUBLE) / $n) AS v")
    val got = operators.StatsQueries.exactGroupPercentiles(df, "g", "v", ps)
    val want = builtin(df, "g", "v")
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(got(k) == want(k), s"$k: got ${got(k)} want ${want(k)}")
  }
}
