package graft

import graft.streaming._
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp

/** CLI + control-semantics suite: arg validation (§2 D3, ports the
  * TestRead error cases of consumer_test.go:39-107), fail-fast first-error
  * termination (§2 D1), and the assembled consume pipeline.
  */
class CliSpec extends SparkSpec {

  // ---- D3: argument validation (command/consume.go:34-37, produce.go:31-34)
  test("no args → help, exit 0 (root command behavior)") {
    assert(Cli.parse(Nil) == Right(Cli.Help))
  }
  test("consume without --stream → help + exit 1") {
    val Left((msg, code)) = Cli.parse(Seq("consume", "-v")): @unchecked
    assert(code == 1)
    assert(msg.contains("--stream is required"))
    assert(msg.contains("Usage:"))
  }
  test("produce without --stream → help + exit 1") {
    val Left((_, code)) = Cli.parse(Seq("produce")): @unchecked
    assert(code == 1)
  }
  test("unknown command rejected") {
    val Left((msg, code)) = Cli.parse(Seq("destroy", "-s", "x")): @unchecked
    assert(code == 1)
    assert(msg.contains("unknown command"))
  }
  test("consume flags parse with reference defaults (limit 500, interval 100, LATEST)") {
    val Right(Cli.Consume(cfg)) = Cli.parse(Seq("c", "-s", "a,b")): @unchecked
    assert(cfg.streams == Seq("a", "b")) // comma-split fan-in, consumer.go:53
    assert(cfg.limit == 500 && cfg.interval == 100L)
    assert(cfg.iterator == "LATEST" && !cfg.verbose)
    assert(cfg.region == "us-west-2")
  }
  test("consume full flag set") {
    val Right(Cli.Consume(cfg)) = Cli.parse(Seq("consume",
      "--stream", "s1", "-I", "AT_TIMESTAMP", "-t", "2024-01-01T02:00:00Z",
      "-l", "7", "-i", "250", "-c", "zlib", "-v", "--spool", "/tmp/x")): @unchecked
    assert(cfg.iterator == "AT_TIMESTAMP" && cfg.since.contains("2024-01-01T02:00:00Z"))
    assert(cfg.limit == 7 && cfg.interval == 250L)
    assert(cfg.compress.contains("zlib") && cfg.verbose && cfg.spool == "/tmp/x")
  }
  test("produce flags parse (key, aggregated, verbose)") {
    val Right(Cli.Produce(cfg)) = Cli.parse(Seq("p", "-s", "out",
      "-k", "fixed", "-a", "-v")): @unchecked
    assert(cfg.key.contains("fixed") && cfg.aggregated && cfg.verbose)
  }
  test("--verify-md5 parses; default stays reference-parity (no verification)") {
    val Right(Cli.Consume(on)) =
      Cli.parse(Seq("consume", "-s", "a", "--verify-md5")): @unchecked
    assert(on.verifyMd5)
    val Right(Cli.Consume(off)) = Cli.parse(Seq("consume", "-s", "a")): @unchecked
    assert(!off.verifyMd5)
  }

  // ---- the assembled consume pipeline (SURVEY §3.1 lifecycle)
  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  test("consume pipeline: deaggregate + zlib + console projection end-to-end") {
    val dir = Files.createTempDirectory("graft-cli").toString
    val deflated = {
      val buf = new java.io.ByteArrayOutputStream()
      val dos = new java.util.zip.DeflaterOutputStream(buf)
      dos.write(b("compressed payload\n")); dos.close(); buf.toByteArray
    }
    val framed = graft.kpl.KplCodec.aggregate(Seq("k1" -> deflated))
    val rows = Seq(
      Row("shardId-000000000000", 1L, Timestamp.valueOf("2024-01-02 03:04:05"),
        "parent", framed, "NONE"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), RecordSchema.schema)
      .write.parquet(s"$dir/s1")
    val cfg = Cli.ConsumeConfig(streams = Seq("s1"), iterator = "TRIM_HORIZON",
      compress = Some("zlib"), spool = dir)
    val lines = Cli.consumeFrame(spark, cfg, batch = true)
      .collect().map(_.getString(0))
    // deaggregated, inflated, trailing \n trimmed, ts-formatted
    assert(lines.toSeq == Seq("2024-01-02 03:04:05 compressed payload"))
  }

  test("--verify-md5 passes NULL-data rows through while dropping corrupt frames") {
    // graft_is_kpl/graft_kpl_md5_ok are nullSafeEval, so without the
    // explicit `data IS NULL OR` arm a NULL-data row would filter to NULL
    // and be silently dropped — diverging from the default path, which
    // passes NULLs through deaggregate. The verify filter must only drop
    // provably-corrupt KPL frames.
    val dir = Files.createTempDirectory("graft-cli").toString
    val goodFrame = graft.kpl.KplCodec.aggregate(Seq("k1" -> b("good payload\n")))
    val corruptFrame = {
      val f = goodFrame.clone()
      f(f.length - 1) = (f(f.length - 1) ^ 0x5A).toByte // break the MD5 trailer
      f
    }
    val rows = Seq(
      Row("shardId-000000000000", 1L, Timestamp.valueOf("2024-01-02 03:04:05"),
        "pk-good", goodFrame, "NONE"),
      Row("shardId-000000000000", 2L, Timestamp.valueOf("2024-01-02 03:04:06"),
        "pk-corrupt", corruptFrame, "NONE"),
      Row("shardId-000000000000", 3L, Timestamp.valueOf("2024-01-02 03:04:07"),
        "pk-null", null, "NONE"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), RecordSchema.schema)
      .write.parquet(s"$dir/s1")
    val cfg = Cli.ConsumeConfig(streams = Seq("s1"), iterator = "TRIM_HORIZON",
      spool = dir, verifyMd5 = true)
    val out = Cli.consumeFrame(spark, cfg, batch = true)
      .collect().map(_.getString(0)).sorted
    // corrupt frame dropped whole; good frame deaggregated; NULL-data row kept
    assert(out.length == 2, s"got ${out.toSeq}")
    assert(out.exists(_.endsWith("good payload")))
    assert(out.forall(!_.contains("corrupt")))
  }

  // ---- D1: first stream error terminates the query (consumer.go:57-61)
  test("fail-fast: a poisoned shard file kills the whole query") {
    val dir = Files.createTempDirectory("graft-cli").toString
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("shardId-000000000000", 1L, Timestamp.valueOf("2024-01-01 00:00:00"),
        "k", b("ok"), "NONE")), 1), RecordSchema.schema)
      .write.parquet(s"$dir/s1")
    // corrupt parquet: valid footer magic missing → task failure at read
    Files.write(java.nio.file.Paths.get(s"$dir/s1/zzz-poison.parquet"),
      "this is not parquet".getBytes(StandardCharsets.UTF_8))
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"), StartPosition.TrimHorizon))
    val q = r.load(spark).writeStream.format("memory")
      .queryName(s"t${System.nanoTime()}")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[StreamingQueryException] { q.awaitTermination() }
    assert(e.getMessage != null)
  }
}
