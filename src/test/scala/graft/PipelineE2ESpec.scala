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

  /** The reference's MAIN LOOP (`run_pipeline.py:19-57`), one test:
    * config parse → DDL fan-out over every configured interval →
    * rate-gated, retried, paginated fetch from a stub feed → normalize →
    * continuous checkpointed upsert (≥2 live micro-batches) → run-log
    * append per pass → stop → restart from the same checkpoint proving
    * the rerun is a no-op (T1+T2+T5 composed, not just unit-tested).
    */
  test("full lifecycle: config -> DDL fan-out -> throttled paginated feed -> continuous upsert -> run log -> idempotent rerun") {
    import graft.sources.{Catalog, Paginator, PipelineConfig}

    val root = Files.createTempDirectory("graft_lifecycle").toString
    val srcDir = s"$root/cache"; val tableDir = s"$root/table"
    val ckDir = s"$root/ck"; val logDir = s"$root/runlog"
    new java.io.File(srcDir).mkdirs()

    // -- config (the reference's config.json shape) --
    val cfg = PipelineConfig.fromJson(spark,
      """{"bars": {"intervals": ["1m", "1h"], "start_date": "2024-01-01",
        |  "quote_assets": ["USDT"]},
        | "rate_limits": {"spot_workers": 2, "futures_workers": 1,
        |  "update_interval_seconds": 60}}""".stripMargin)
    assert(cfg.intervals === Seq("1m", "1h"))

    // -- DDL fan-out: one table per configured interval, idempotent --
    val ddl = "symbol STRING, ts BIGINT, close DOUBLE"
    cfg.intervals.foreach { iv =>
      val name = Catalog.klineTableName("spot", iv)
      Catalog.ensureTable(spark, name, ddl, s"$root/tables/$name")
      Catalog.ensureTable(spark, name, ddl, s"$root/tables/$name") // rerun-safe
      assert(spark.catalog.tableExists(name), name)
    }
    assert(spark.catalog.tableExists("bn_spot_klines_1min"))
    assert(spark.catalog.tableExists("bn_spot_klines_1hour"))

    // -- stub feed: 5 one-minute bars, paged by 2, behind the shared rate
    // gate (2 calls/window, fake clock: zero wall time) and the bounded
    // retry (first network call fails once) --
    val t0 = 1704067200000L
    val feed: Vector[(Long, String)] =
      (0 until 5).map(i => (t0 + i * 60000L, s"10${i + 1}.0")).toVector
    var clockMs = 0L
    val sleeps = scala.collection.mutable.Buffer[Long]()
    val gate = new Paginator.RateGate(maxCalls = 2, periodMs = 1000L,
      clock = () => clockMs, sleep = ms => { sleeps += ms; clockMs += ms })
    var calls = 0
    def fetchPage(cursor: Long, end: Long, limit: Int): Seq[(Long, String)] =
      gate.throttled {
        calls += 1
        if (calls == 1) throw new RuntimeException("HTTP 429: banned until 7")
        feed.filter { case (ts, _) => ts >= cursor && ts <= end }.take(limit)
      }
    val rows = Paginator.fetchRange(t0, t0 + 4 * 60000L, pageLimit = 2) {
      (c, e, l) => Paginator.retry(attempts = 3, backoffMs = 1L,
        sleep = _ => ())(() => fetchPage(c, e, l))
    }(_._1)
    assert(rows === feed)                      // complete, in order
    assert(sleeps.nonEmpty)                    // the gate actually throttled
    assert(Paginator.parseBanUntil("banned until 7") === Some(7L))

    // -- the long-running loop: continuous checkpointed upsert --
    val b1 = Klines.normalize(page(rows), "BTCUSDT", "binance", "spot", "1m")
      .withColumn("ingest_seq", lit(1L))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$root/stage_$name"
      df.coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$srcDir/$name.parquet")))
    }
    def tableClose(ts: Long): Double = spark.read.parquet(tableDir)
      .filter($"timestamp" === timestamp_millis(lit(ts)))
      .select($"close".cast("double")).as[Double].head()
    def await(expect: Long => Boolean, hint: String): Unit = {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while ({
        val n = scala.util.Try(spark.read.parquet(tableDir).count()).getOrElse(0L)
        if (expect(n)) false
        else if (System.nanoTime() > deadline) fail(s"timeout waiting: $hint (n=$n)")
        else { Thread.sleep(150); true }
      }) ()
    }
    val q = IncrementalIngest.runContinuous(spark, srcDir, b1.schema,
      keys = Seq("symbol", "interval", "timestamp"), version = Seq("ingest_seq"),
      tsCol = "timestamp", tableDir = tableDir, checkpointDir = ckDir,
      intervalMs = 200)
    try {
      land(b1, "b1")
      await(_ == 5, "first live batch")
      Catalog.RunLog.append(spark, logDir, "success", "pass 1: 5 bars")

      // scheduler pass 2: overlapping refetch corrects the last bar + 1 new
      val b2 = Klines.normalize(
          page(Seq((t0 + 4 * 60000L) -> "999.0", (t0 + 5 * 60000L) -> "106.0")),
          "BTCUSDT", "binance", "spot", "1m")
        .withColumn("ingest_seq", lit(2L))
      land(b2, "b2")
      await(_ == 6, "second live batch")
      Catalog.RunLog.append(spark, logDir, "success", "pass 2: refetch + 1 bar")

      assert(tableClose(t0 + 4 * 60000L) === 999.0)  // keep-last won
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2) // ≥2 micro-batches
    } finally q.stop()

    // -- run log: append-only audit of both passes --
    val log = Catalog.RunLog.read(spark, logDir)
    assert(log.count() === 2)
    assert(log.filter($"status" === "success").count() === 2)
    assert(log.filter($"timestamp".isNull).count() === 0)

    // -- restart from the same checkpoint: rerun is a no-op --
    val q2 = IncrementalIngest.runContinuous(spark, srcDir, b1.schema,
      keys = Seq("symbol", "interval", "timestamp"), version = Seq("ingest_seq"),
      tsCol = "timestamp", tableDir = tableDir, checkpointDir = ckDir,
      intervalMs = 200)
    try {
      q2.processAllAvailable()
      assert(q2.recentProgress.map(_.numInputRows).sum === 0)
      assert(spark.read.parquet(tableDir).count() === 6)
      assert(tableClose(t0 + 4 * 60000L) === 999.0)
    } finally q2.stop()
  }
}
