package graft

import org.apache.spark.sql.functions._

/** Specs for the round-3 stats/sampling/reshape batch (StatsQueries). */
class StatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q70 moment stats agree with Spark's builtin estimators") {
    val got = run("q70_stats_moments").collect()
      .map(r => r.getString(0) -> r).toMap
    val want = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(avg("l_quantity").as("mean"),
        var_pop("l_quantity").as("varp"),
        stddev_samp("l_quantity").as("sd"),
        skewness("l_quantity").as("skew"),
        kurtosis("l_quantity").as("kurt"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("slope"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("icpt"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet)
    for ((flag, g) <- got) {
      val w = want(flag)
      val pairs = Seq( // (ours, builtin, tolerance)
        (g.getDouble(2), w.getDouble(1), 1e-6), // mean
        (g.getDouble(3), w.getDouble(2), 1e-4), // var_pop
        (g.getDouble(4), w.getDouble(3), 1e-6), // stddev_samp
        (g.getDouble(5), w.getDouble(4), 1e-4), // skewness (population g1)
        (g.getDouble(6), w.getDouble(5), 1e-3), // kurtosis (excess)
        (g.getDouble(7), w.getDouble(6), 1e-6), // corr
        (g.getDouble(8), w.getDouble(7), 1e-4), // regr_slope
        (g.getDouble(9), w.getDouble(8), 1e-1)) // regr_intercept (~1e4 scale)
      pairs.zipWithIndex.foreach { case ((ours, builtin, tol), i) =>
        assert(math.abs(ours - builtin) <= tol * math.max(1.0, math.abs(builtin)),
          s"flag=$flag stat#$i ours=$ours builtin=$builtin")
      }
    }
  }

  test("q71 hash sample is deterministic and ~25% of rows") {
    val orders = Tables.t(spark, sf, "orders").count()
    val sampled = run("q71_hash_sample").agg(sum("n_sampled")).head.getLong(0)
    val frac = sampled.toDouble / orders
    assert(frac > 0.15 && frac < 0.35, s"sample fraction $frac out of band")
    // determinism: second run identical
    assert(run("q71_hash_sample").collect().toSet ==
      run("q71_hash_sample").collect().toSet)
  }

  test("q72 unpivot reshapes 3 wide columns into 3 long rows per flag") {
    val df = run("q72_unpivot")
    val flags = df.select("l_returnflag").distinct().count()
    assert(df.count() == flags * 3)
    assert(df.select("metric").distinct().collect().map(_.getString(0)).sorted
      .sameElements(Array("disc", "price", "qty")))
  }

  test("q73 lateral top-n decorrelates (no per-group re-scan) and keeps 2 per group") {
    val df = run("q73_lateral_topn")
    val perGroup = df.groupBy("o_orderpriority").count().collect()
    assert(perGroup.nonEmpty && perGroup.forall(_.getLong(1) <= 2))
    // each group's rows are its true top-2 by (price desc, key)
    val top = Tables.t(spark, sf, "orders")
      .withColumn("rn", expr(
        """row_number() OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey)"""))
      .where(col("rn") <= 2)
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = df.select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == top)
  }

  test("q74 sketch estimates stay within tolerance of exact values") {
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(count_distinct(col("l_orderkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q74_approx_agg").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getLong(1) == exact(flag), s"exact_orders mismatch for $flag")
      // the within-bound booleans ARE the sketch contract the oracle hashes
      Seq("hll_ok", "p25_ok", "p50_ok", "p75_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c false for $flag")
      }
    }
  }

  test("q88 approx robust stats stay within bound of the exact forms") {
    val rows = run("q88_approx_robust").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("p25_ok", "p50_ok", "p75_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c false for ${r.getString(0)}")
      }
    }
  }

  test("q75 near-dup pairs are ordered, banded, and within the threshold") {
    val rows = run("q75_edit_neardup").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 25)
    }
  }

  test("q75 hot-first-token blocks are capped: fan-out stays bounded") {
    import spark.implicits._
    // 500 docs sharing first token AND length band — natural-language
    // first-token concentration ("The …") in its worst form. Uncapped,
    // the (tok0, band) self-join emits C(500,2) ≈ 125k pairs; the
    // BucketCap guard must drop the whole block. Plus one small block
    // (distinct first token) whose near-dup pair must survive untouched.
    val mega = (1L to 500L).map { i =>
      (i, f"The common boilerplate sentence number $i%04d")
    }
    val pair = Seq(
      (1001L, "Zebra quick brown fox jumps over the lazy dog"),
      (2001L, "Zebra quick brown fox jumped over the lazy dog"))
    val corpus = (mega ++ pair)
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))

    val capped = operators.StatsQueries.editCandidates(corpus)
      .select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1001L, 2001L)),
      s"cap must keep exactly the small block's pair, got ${capped.size} pairs")

    // with the cap lifted the quadratic blow-up is real — the guard is
    // doing work, not passing an already-small block
    val uncapped = operators.StatsQueries.editCandidates(corpus, cap = 1000).count()
    assert(uncapped >= 500L * 499 / 2,
      s"uncapped blocks should explode quadratically, got $uncapped")

    // the surviving pair verifies at its true edit distance
    val nd = operators.StatsQueries.editNearDup(corpus).collect()
    assert(nd.length == 1 && nd.head.getLong(0) == 1001L
      && nd.head.getInt(2) == 2 && nd.head.getLong(1) == 2001L)
  }

  test("q111 bigram LM scores match hand-computed smoothed probabilities") {
    import spark.implicits._
    // corpus: doc 1 = "a b a b" (bigrams ab, ba, ab), doc 2 = "c c"
    // (bigram cc), doc 3 = "z" (no bigrams — dropped, but its token
    // joins the vocabulary). V = 4 (a, b, c, z).
    // counts: c12(ab)=2, c12(ba)=1, c12(cc)=1; c1(a)=2, c1(b)=1, c1(c)=1
    // doc 1 terms: ab = (2+1)e6 div (2+4) = 500000 (×2),
    //              ba = (1+1)e6 div (1+4) = 400000
    //   → n=3, score = 1400000 div 3 = 466666
    // doc 2 term:  cc = (1+1)e6 div (1+4) = 400000 → n=1, score=400000
    val corpus = Seq((1L, "a b a b"), (2L, "c c"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = operators.LlmQueries.bigramLmScore(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (3L, 466666L), 2L -> (1L, 400000L)))
  }

  test("q112 CMS path reproduces q111's exact scores and honors its bounds") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b"), (2L, "c c"), (3L, "z"))
      .toDF("doc_id", "text")
    val rows = operators.LlmQueries.bigramLmCms(corpus).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    // exact score column identical to q111's; both audit booleans hold
    // (at this corpus size the sketch should be collision-free, so the
    // one-sided estimate equals the exact count)
    assert(rows == Map(1L -> (3L, 466666L, true, true),
      2L -> (1L, 400000L, true, true)))
  }

  test("q76 gap-fill emits a dense day × event_type grid with zero fills") {
    val df = run("q76_gapfill")
    val types = df.select("event_type").distinct().count()
    assert(df.count() == 30 * types)
    // zero-filled rows exist only where events has no (day, type) row
    val ev = Tables.t(spark, sf, "events")
    val observed = ev
      .selectExpr(s"CAST(timestamp_micros(${Tables.tsUsSql(ev)}) AS DATE) AS day",
        "event_type")
      .distinct().count()
    val nonZero = df.where(col("cnt") > 0).count()
    assert(nonZero == observed)
  }

  test("q121 decile audit: uniform corpus balances deciles, boundary ties go low") {
    import spark.implicits._
    val docs = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 40).map(i => ("b", (i * 3).toLong)))
      .toDF("source", "n_chars")
    val got = operators.LlmQueries.scoreDecileAudit(docs)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // source a = 1..100: every decile holds exactly 10 docs, and the
    // interpolated boundaries (10.9, 20.8, ...) split [1,100] cleanly
    for (d <- 0 to 9) {
      val (n, lo, hi) = got(("a", d))
      assert(n == 10L, s"decile $d holds $n")
      assert(lo == d * 10 + 1L && hi == d * 10 + 10L, s"decile $d range [$lo,$hi]")
    }
    // source b groups 40 docs into 10 deciles of 4 — per-source boundaries
    assert((0 to 9).forall(d => got(("b", d))._1 == 4L))
  }
}
