package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.TestSpark

/** K2 integration test against embedded Derby (on Spark's classpath for the
  * Hive metastore) — a real JDBC round trip with zero egress: write with the
  * batch writer, read back through the JDBC source, append again.
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = JdbcSink.Config(
    url = "jdbc:derby:memory:graftdb;create=true",
    table = "klines_sink",
    batchSize = 500,
    numPartitions = Some(2),
    // Derby rejects READ_UNCOMMITTED on updates; the default targets
    // warehouse appends, an embedded test overrides per-DB
    isolationLevel = "READ_COMMITTED",
    driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))

  private def frame = Seq(
    ("BTCUSDT", 1L, 100.5), ("BTCUSDT", 2L, 101.0), ("ETHUSDT", 1L, 10.25)
  ).toDF("symbol", "ts", "close")

  test("write -> read round trip preserves rows; append accumulates") {
    JdbcSink.write(frame, cfg, SaveMode.Overwrite)
    val back = JdbcSink.read(spark, cfg)
      .select("symbol", "ts", "close")
      .as[(String, Long, Double)].collect().toSet
    assert(back === Set(("BTCUSDT", 1L, 100.5), ("BTCUSDT", 2L, 101.0),
      ("ETHUSDT", 1L, 10.25)))

    JdbcSink.write(frame, cfg, SaveMode.Append)
    assert(JdbcSink.read(spark, cfg).count() === 6L)
  }

  test("config plumbing: batch/connection options reach the JDBC relation") {
    // invalid batch size must fail fast, before any connection attempt
    intercept[IllegalArgumentException] {
      JdbcSink.write(frame, cfg.copy(batchSize = 0))
    }
    // connection cap: the writer coalesces, so even a wildly repartitioned
    // input funnels into numPartitions writer tasks (observable as plan
    // partitions, not connections, in an embedded test)
    val wide = frame.repartition(16)
    JdbcSink.write(wide, cfg.copy(table = "klines_capped"), SaveMode.Overwrite)
    assert(JdbcSink.read(spark, cfg.copy(table = "klines_capped")).count() === 3L)
  }

  test("upsert round trip: append overlap, keep-last read-back (ReplacingMergeTree FINAL analog)") {
    val c = cfg.copy(table = "klines_upsert")
    val run1 = Seq(
      ("BTCUSDT", 1L, 100.5, 1L), ("BTCUSDT", 2L, 101.0, 1L),
      ("ETHUSDT", 1L, 10.25, 1L)
    ).toDF("symbol", "ts", "close", "ingest_seq")
    // run 2 re-fetches bar ts=2 with a correction and adds ts=3
    val run2 = Seq(
      ("BTCUSDT", 2L, 999.0, 2L), ("BTCUSDT", 3L, 102.0, 2L)
    ).toDF("symbol", "ts", "close", "ingest_seq")

    JdbcSink.write(run1, c, SaveMode.Overwrite)
    JdbcSink.write(run2, c, SaveMode.Append)       // overlap appends, not updates
    assert(JdbcSink.read(spark, c).count() === 5L) // raw table keeps both versions

    val fin = JdbcSink.readDeduped(spark, c,
        keys = Seq("symbol", "ts"), version = Seq("ingest_seq"))
      .select("symbol", "ts", "close")
      .as[(String, Long, Double)].collect().toSet
    assert(fin === Set(
      ("BTCUSDT", 1L, 100.5), ("BTCUSDT", 2L, 999.0),  // run 2 won the overlap
      ("BTCUSDT", 3L, 102.0), ("ETHUSDT", 1L, 10.25)))

    // idempotence: re-appending run2 verbatim (a retried writer task)
    // changes nothing after the keep-last read
    JdbcSink.write(run2, c, SaveMode.Append)
    val again = JdbcSink.readDeduped(spark, c,
        keys = Seq("symbol", "ts"), version = Seq("ingest_seq"))
      .select("symbol", "ts", "close")
      .as[(String, Long, Double)].collect().toSet
    assert(again === fin)
  }
}
