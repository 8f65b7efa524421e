package graft

import org.apache.spark.sql.functions._

/** Embedding aggregation batch (VectorQueries): centroid grid shape and
  * quantization code ranges.
  */
class VectorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q77 emits one centroid per (label, dim) and means stay in data range") {
    val df = run("q77_embed_centroids")
    val labels = df.select("label").distinct().count()
    assert(df.count() == labels * 64)
    val Array(lo, hi) = df.agg(min("centroid"), max("centroid")).head
      .toSeq.map(_.asInstanceOf[Double]).toArray
    assert(lo > -1.0 && hi < 1.0)
  }

  test("q78 quantization codes span [-127, 127] and scale is positive") {
    val df = run("q78_embed_quantize")
    assert(df.where(col("scale") <= 0).count() == 0)
    // floor(x*127/scale) with |x| <= scale lands in [-127, 127]
    assert(df.where(col("qmin") < -127 || col("qmax") > 127).count() == 0)
    // at least one vector's max element IS the scale → code 127 reachable
    assert(df.where(col("qmax") === 127).count() > 0)
  }
}
