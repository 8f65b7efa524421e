package graft

import org.apache.spark.sql.functions._

/** Hash-stability guarantees of the deterministic split/sample operators:
  * q105 and q107 claim that growing the corpus never changes an existing
  * document's assignment (the property row_number/ntile/percent-based
  * splits do NOT have). These specs run the real query path against an
  * extended copy of the fixture and assert the original assignments are
  * byte-identical — a regression to any universe-relative scheme fails
  * here.
  */
class SamplingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The sf0.001 documents plus `extra` synthetic docs in a fresh source,
    * written as a temp fixture dir the queries can read like any SF dir.
    */
  private def grownFixture(extra: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-grow").toString
    val docs = Tables.t(spark, sf, "documents")
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val grown = docs.unionByName(
      spark.range(1, extra + 1).toDF("i").selectExpr(
        s"i + $maxId AS doc_id",
        "concat('fresh doc number ', CAST(i AS STRING), ' with words') AS text",
        "'en' AS lang", "'src_new' AS source",
        "CAST(38 + length(CAST(i AS STRING)) AS BIGINT) AS n_chars"))
    grown.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q105 split assignments are stable under corpus growth") {
    val before = SparkEntry.queries("q105_hash_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val dir = grownFixture(extra = 200)
    val after = SparkEntry.queries("q105_hash_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(after.size == before.size + 200)
    before.foreach { case (id, assign) =>
      assert(after(id) == assign, s"doc $id moved splits when the corpus grew")
    }
    // every split is populated at this SF — a degenerate all-train split
    // would also satisfy stability
    assert(after.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("q107 per-source sample counts are stable when a new source arrives") {
    def bySource(dir: String) =
      SparkEntry.queries("q107_stratified_sample")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val before = bySource(sf)
    val dir = grownFixture(extra = 200)
    val after = bySource(dir)
    assert(after.keySet == before.keySet + "src_new")
    before.foreach { case (src, counts) =>
      assert(after(src) == counts,
        s"source $src sample membership changed when an unrelated source arrived")
    }
    // the new stratum gets its own deterministic ~10% rate, not zero
    val (n, sampled) = after("src_new")
    assert(n == 200 && sampled > 0 && sampled < 60)
  }

  test("q104 training order is invariant to the shard-prefix width") {
    // hex-prefix order is string order at ANY width, so the prefix is a
    // pure parallelism knob: ranks must be bit-identical at width 2
    // (the old fixed 256-shard ceiling) and width 4 (the 100 TB setting)
    val docs = Tables.t(spark, sf, "documents").select("doc_id")
    def ranks(p: Int) =
      operators.LlmQueries.trainingOrder(docs, prefixHexDigits = p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = ranks(2)
    val r4 = ranks(4)
    assert(r2 == r4, "ranks drifted between prefix widths 2 and 4")
    // and the ranks are a permutation of 1..n
    assert(r2.values.toSeq.sorted == (1L to r2.size.toLong))
  }
}
