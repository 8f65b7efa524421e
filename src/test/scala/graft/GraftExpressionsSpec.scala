package graft

import graft.kpl.KplCodec
import graft.plans.{GraftExtensions, ZlibOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets

/** Native-expression suite: registration, correctness vs the UDF path, and
  * the codegen/fold properties that motivate the expression form.
  */
class GraftExpressionsSpec extends SparkSpec {

  private def b(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private lazy val registered: Unit = GraftExtensions.register(spark)

  private def df(rows: Seq[Array[Byte]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), 2),
      StructType(Seq(StructField("data", BinaryType))))

  test("graft_is_kpl matches KplCodec semantics incl. null") {
    registered
    val rows = Seq(b("plain"), KplCodec.Magic ++ b("x"), null)
    val out = df(rows).selectExpr("graft_is_kpl(data) AS agg")
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq == Seq(false, true, null))
  }

  test("graft_inflate_zlib round-trips and passes raw bytes through on error") {
    registered
    val payload = ("abc " * 100).getBytes(StandardCharsets.UTF_8)
    val deflated = {
      val buf = new java.io.ByteArrayOutputStream()
      val dos = new java.util.zip.DeflaterOutputStream(buf)
      dos.write(payload); dos.close(); buf.toByteArray
    }
    val raw = b("P:not zlib")
    val out = df(Seq(deflated, raw))
      .selectExpr("graft_inflate_zlib(data) AS d")
      .collect().map(_.getAs[Array[Byte]]("d").toSeq)
    assert(out(0) == payload.toSeq)
    assert(out(1) == raw.toSeq)
  }

  test("expressions stay inside whole-stage codegen (no ScalaUDF node)") {
    registered
    val plan = df(Seq(b("x")))
      .selectExpr("graft_is_kpl(data)", "graft_inflate_zlib(data)")
      .queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("ScalaUDF"), s)
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(s.contains("*(1) Project"), s)
  }

  test("literal input constant-folds at plan time") {
    registered
    val optimized = spark.sql("SELECT graft_is_kpl(X'F3899AC2AB') AS v")
      .queryExecution.optimizedPlan
    // after constant folding the expression is gone, only the literal remains
    assert(!optimized.toString.contains("graft_is_kpl"), optimized.toString)
  }

  test("graft_vector_dot equals the left-fold dot product, bit-exact") {
    registered
    val df = spark.sql(
      "SELECT graft_vector_dot(array(1.5D, -2.0D, 0.25D), array(4.0D, 0.5D, 8.0D)) AS d, " +
        "graft_vector_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) IS NULL AS n")
    val row = df.collect().head
    assert(row.getDouble(0) == 1.5 * 4.0 + -2.0 * 0.5 + 0.25 * 8.0)
    assert(row.getBoolean(1), "null array input must yield null")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  test("ZlibOps static kernel equals the UDF kernel") {
    val payload = Array.tabulate(512)(i => (i * 7).toByte)
    val deflated = {
      val buf = new java.io.ByteArrayOutputStream()
      val dos = new java.util.zip.DeflaterOutputStream(buf)
      dos.write(payload); dos.close(); buf.toByteArray
    }
    assert(ZlibOps.inflateOrRaw(deflated).toSeq == payload.toSeq)
    assert(ZlibOps.inflateOrRaw(payload).toSeq == payload.toSeq) // not zlib → raw
  }
}
