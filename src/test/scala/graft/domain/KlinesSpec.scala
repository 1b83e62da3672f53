package graft.domain

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** End-to-end domain coverage on the reference's own shapes (FIXTURES.md
  * micro-fixtures): raw page → normalize → dedupe → resample → as-of
  * funding join, plus exchange-info JSON symbol extraction.
  */
class KlinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rawPage = {
    // two 1m bars (epoch ms), numbers as strings — exactly the API shape
    Seq(
      (1704067200000L, "100.0", "101.5", "99.0", "101.0", "10.0",
        1704067259999L, "1000.0", 42L, "6.0", "600.0", "0"),
      (1704067260000L, "101.0", "103.0", "100.5", "102.0", "20.0",
        1704067319999L, "2000.0", 43L, "12.0", "1200.0", "0")
    ).toDF("timestamp", "open", "high", "low", "close", "volume",
      "close_time", "quote_volume", "trades_count",
      "taker_buy_volume", "taker_buy_quote_volume", "ignore")
  }

  test("normalize: casts, epoch-ms timestamps, literal stamps, column order") {
    val out = Klines.normalize(rawPage, "BTCUSDT", "binance", "spot", "1m")
    assert(out.columns.toSeq === Klines.schema.fieldNames.toSeq)
    val r = out.orderBy("timestamp").head
    assert(r.getAs[String]("symbol") === "BTCUSDT")
    // price columns are exact DECIMAL(18,8) per the reference's Decimal64(8)
    assert(r.getAs[java.math.BigDecimal]("open").compareTo(
      new java.math.BigDecimal("100.0")) === 0)
    assert(r.getAs[Long]("trades_count") === 42L)
    assert(r.getAs[java.sql.Timestamp]("timestamp").getTime === 1704067200000L)
  }

  test("dedupe: re-ingested overlapping page collapses keep-last") {
    val k1 = Klines.normalize(rawPage, "BTCUSDT", "binance", "spot", "1m")
      .withColumn("ingest_seq", lit(1L))
    // refetch of the same window with a corrected close
    val k2 = Klines.normalize(
        rawPage.withColumn("close", lit("999.0")), "BTCUSDT", "binance", "spot", "1m")
      .withColumn("ingest_seq", lit(2L))
    val merged = Klines.dedupe(k1.unionByName(k2), "ingest_seq")
    assert(merged.count() === 2)
    assert(merged.select($"close".cast("double")).as[Double]
      .collect().toSet === Set(999.0))
  }

  test("resample 1m -> 1h: OHLC follows bar time, volumes add") {
    val k = Klines.normalize(rawPage, "BTCUSDT", "binance", "spot", "1m")
    val h = Klines.resample(k, "1 hour", "1h")
    assert(h.count() === 1)
    val r = h.select($"open".cast("double"), $"close".cast("double"),
      $"high".cast("double"), $"low".cast("double"),
      $"volume".cast("double"), $"trades_count").head
    assert(r.getDouble(0) === 100.0)  // first bar's open
    assert(r.getDouble(1) === 102.0)  // last bar's close
    assert(r.getDouble(2) === 103.0)
    assert(r.getDouble(3) === 99.0)
    assert(r.getDouble(4) === 30.0)
    assert(r.getLong(5) === 85L)
    assert(h.head.getAs[String]("interval") === "1h")
  }

  test("resample only reads its source interval — mixed tables don't double-count") {
    val m = Klines.normalize(rawPage, "BTCUSDT", "binance", "spot", "1m")
    val derived1h = Klines.resample(m, "1 hour", "1h")
    // table laid out with both configured intervals ([1m,1h]) in one frame
    val out = Klines.resample(m.unionByName(derived1h), "1 hour", "1h",
      sourceInterval = "1m")
    assert(out.count() === 1)
    assert(out.select($"volume".cast("double")).head.getDouble(0) === 30.0) // not 60: 1h rows ignored
  }

  test("coerceNumeric: garbage strings -> 0.0 (to_numeric errors=coerce analog)") {
    val df = Seq("1.5", "garbage", null).toDF("x")
    val out = df.select(Klines.coerceNumeric($"x").as("v")).as[Double].collect().toSeq
    assert(out === Seq(1.5, 0.0, 0.0))
  }

  test("as-of funding join aligns latest prior rate per symbol") {
    val k = Klines.normalize(rawPage, "BTCUSDT", "binance", "spot", "1m")
    val funding = Seq(
      ("BTCUSDT", 1704067100000L, 0.0001, 100.5),
      ("BTCUSDT", 1704067230000L, 0.0002, 101.0)
    ).toDF("symbol", "ft_ms", "fundingRate", "markPrice")
      .withColumn("fundingTime", timestamp_millis($"ft_ms")).drop("ft_ms")
    val out = Klines.withFundingRate(k, funding)
      .orderBy("timestamp").select("fundingRate").as[Double].collect().toSeq
    assert(out === Seq(0.0001, 0.0002))
  }

  test("margin-rate normalization: epoch-ms, coercion, literal stamps") {
    val raw = Seq(
      (1704067200000L, "0.0002"),
      (1704153600000L, "garbage")
    ).toDF("timestamp", "dailyInterestRate")
    val out = Klines.normalizeMarginRates(raw, "BTC", "binance", 0)
      .orderBy("timestamp").collect()
    assert(out.map(_.getAs[Double]("daily_interest_rate")).toSeq === Seq(0.0002, 0.0))
    assert(out(0).getAs[java.sql.Timestamp]("timestamp").getTime === 1704067200000L)
    assert(out(0).getAs[String]("asset") === "BTC")
  }

  test("exchange-info JSON: spot + perp symbol extraction with nested filters") {
    val payload = """{"symbols":[
      {"symbol":"BTCUSDT","baseAsset":"BTC","quoteAsset":"USDT","status":"TRADING",
       "isMarginTradingAllowed":true,"contractType":"PERPETUAL",
       "deliveryDate":4133404800000,"underlyingSubType":["PoW","Layer1"],
       "filters":[{"filterType":"LOT_SIZE","stepSize":"0.001"},
                  {"filterType":"PRICE_FILTER","minPrice":"0.01","tickSize":"0.01"}]},
      {"symbol":"XYZUSD","baseAsset":"XYZ","quoteAsset":"USD","status":"BREAK",
       "isMarginTradingAllowed":false,"contractType":"CURRENT_QUARTER",
       "deliveryDate":1735689600000,"underlyingSubType":[],
       "filters":[]}]}"""
    val info = spark.read.json(Seq(payload).toDS())

    val spot = SymbolDim.spotSymbols(info).orderBy("symbol").collect()
    assert(spot.length === 2)
    assert(spot(0).getAs[String]("symbol") === "BTCUSDT")
    assert(spot(0).getAs[Double]("tick_size") === 0.01)
    assert(spot(0).getAs[Boolean]("is_trading"))
    assert(spot(1).getAs[Double]("tick_size") === 0.0)  // missing filter -> 0

    val perp = SymbolDim.perpSymbols(info).collect()
    assert(perp.length === 1)  // only PERPETUAL kept
    assert(perp(0).getAs[String]("underlying_sub_type") === "PoW,Layer1")
    assert(perp(0).getAs[Double]("step_size") === 0.001)
  }
}
