package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.domain.Klines
import graft.sources.JdbcSink
import graft.streaming.IncrementalIngest

/** End-to-end reference-pipeline shape (`run_pipeline.py` →
  * `crypto_data_pipeline_clickhouse.py` flow): paginated fetch pages →
  * normalize → cached batch files → checkpointed incremental upsert with
  * keep-last dedup → monthly-partitioned table → resample → funding as-of →
  * external warehouse sink. One spec drives the whole chain so "a user of
  * the reference could switch" is a tested claim, not a diagram.
  */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(closes: Seq[(Long, String)]) = closes.map { case (ts, c) =>
    (ts, "100.0", "101.0", "99.0", c, "10.0",
      ts + 59999L, "1000.0", 42L, "6.0", "600.0", "0")
  }.toDF("timestamp", "open", "high", "low", "close", "volume",
    "close_time", "quote_volume", "trades_count",
    "taker_buy_volume", "taker_buy_quote_volume", "ignore")

  test("ingest -> upsert -> resample -> as-of -> warehouse sink round trip") {
    val root = Files.createTempDirectory("graft_e2e").toString
    val srcDir = s"$root/cache"
    val tableDir = s"$root/table"
    val ckDir = s"$root/ck"
    new java.io.File(srcDir).mkdirs()

    val t0 = 1704067200000L // 2024-01-01 00:00 UTC
    // run 1: two 1m bars
    val run1 = Klines.normalize(
        page(Seq(t0 -> "101.0", (t0 + 60000L) -> "102.0")),
        "BTCUSDT", "binance", "spot", "1m")
      .withColumn("ingest_seq", lit(1L))
    // run 2: overlapping refetch corrects the second bar + adds a third
    val run2 = Klines.normalize(
        page(Seq((t0 + 60000L) -> "999.0", (t0 + 120000L) -> "103.0")),
        "BTCUSDT", "binance", "spot", "1m")
      .withColumn("ingest_seq", lit(2L))
    // the file stream source lists srcDir non-recursively: stage each
    // batch, then move its part file flat into srcDir (the cache-file shape)
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$root/stage_$name"
      df.coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$srcDir/$name.parquet")))
    }
    land(run1, "b1")

    def ingestOnce(): Unit = IncrementalIngest.runOnce(
      spark, srcDir, run1.schema,
      keys = Seq("symbol", "interval", "timestamp"), version = Seq("ingest_seq"),
      tsCol = "timestamp", tableDir = tableDir, checkpointDir = ckDir)

    ingestOnce()                                   // catch-up pass 1
    land(run2, "b2")
    ingestOnce()                                   // catch-up pass 2 (new file only)

    val table = spark.read.parquet(tableDir)
    assert(table.count() === 3)                    // keep-last collapsed the overlap
    val corrected = table
      .filter($"timestamp" === timestamp_millis(lit(t0 + 60000L)))
      .select($"close".cast("double")).as[Double].head()
    assert(corrected === 999.0)                    // run 2 won

    // resample the upserted table to 1h bars
    val bars = Klines.resample(table.drop("ingest_seq", "ym"), "1 hour", "1h")
    assert(bars.count() === 1)
    assert(bars.select($"close".cast("double")).head().getDouble(0) === 103.0)
    assert(bars.select($"volume".cast("double")).head().getDouble(0) === 30.0)

    // align the latest prior funding rate
    val funding = Seq(("BTCUSDT", t0 - 1000L, 0.0001, 100.0))
      .toDF("symbol", "ft", "fundingRate", "markPrice")
      .withColumn("fundingTime", timestamp_millis($"ft")).drop("ft")
    val withRate = Klines.withFundingRate(bars, funding)
    assert(withRate.select("fundingRate").as[Double].head() === 0.0001)

    // ship to the external warehouse (embedded Derby stands in)
    val cfg = JdbcSink.Config(
      url = "jdbc:derby:memory:graft_e2e;create=true", table = "bars_1h",
      isolationLevel = "READ_COMMITTED",
      driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))
    JdbcSink.write(
      withRate.select($"symbol", $"timestamp",
        $"close".cast("double").as("close"),
        $"volume".cast("double").as("volume"), $"fundingRate"),
      cfg, SaveMode.Overwrite)
    val back = JdbcSink.read(spark, cfg)
    assert(back.count() === 1)
    assert(back.select("close").as[Double].head() === 103.0)
  }
}
