package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{AsOf, Dedup}

/** The reference's domain model, re-expressed as Spark operators: OHLCV
  * kline tables keyed (symbol, interval, timestamp) with last-write-wins
  * semantics (`app/src/crypto_data_pipeline_clickhouse.py:444-460` schema,
  * `:541` ReplacingMergeTree, `:560-584` per-interval tables).
  *
  * REST fetching itself (the reference's `get_historical_klines`,
  * `:249-302`) is driver-side I/O, not dataflow — any paged fetcher can feed
  * [[normalize]]; everything from raw page rows onward is engine surface.
  */
object Klines {

  /** A raw kline page row as the exchange API returns it: epoch-millis longs
    * + NUMBERS AS STRINGS (the reference casts with `astype(float)` at
    * `crypto_data_pipeline_clickhouse.py:377`).
    */
  val rawSchema = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("open", StringType), StructField("high", StringType),
    StructField("low", StringType), StructField("close", StringType),
    StructField("volume", StringType),
    StructField("close_time", LongType),
    StructField("quote_volume", StringType),
    StructField("trades_count", LongType),
    StructField("taker_buy_volume", StringType),
    StructField("taker_buy_quote_volume", StringType),
    StructField("ignore", StringType)))

  /** Price/volume column type: DECIMAL(18,8), the reference README's
    * advertised Decimal64(8) (`/root/reference/README.md:10`) — the API's
    * 8-decimal strings round-trip exactly, and sums/dedups are plan-shape-
    * independent (decimal arithmetic is associative where double is not).
    */
  val priceType: DecimalType = DecimalType(18, 8)

  /** The canonical 15-column kline schema (`KLINES_SCHEMA` :444-460;
    * exact projection order :383-387). UInt32 trades_count → Long.
    */
  val schema = StructType(Seq(
    StructField("symbol", StringType), StructField("exchange", StringType),
    StructField("type", StringType), StructField("interval", StringType),
    StructField("timestamp", TimestampType), StructField("close_time", TimestampType),
    StructField("open", priceType), StructField("high", priceType),
    StructField("low", priceType), StructField("close", priceType),
    StructField("volume", priceType), StructField("quote_volume", priceType),
    StructField("taker_buy_volume", priceType),
    StructField("taker_buy_quote_volume", priceType),
    StructField("trades_count", LongType)))

  private val priceCols = Seq("open", "high", "low", "close", "volume",
    "quote_volume", "taker_buy_volume", "taker_buy_quote_volume")

  /** Raw page → canonical rows: epoch-ms → UTC timestamp (F1), string →
    * exact decimal (F11 — the reference's `astype(float)` loses the API's
    * 8-dp precision; Decimal64(8) is what its own README specifies),
    * literal dimension stamps (P2), fixed column order (P1).
    * Mirrors `crypto_data_pipeline_clickhouse.py:372-387`.
    */
  def normalize(raw: DataFrame, symbol: String, exchange: String,
                marketType: String, interval: String): DataFrame = {
    val cols = Seq(
      lit(symbol).as("symbol"),
      lit(exchange).as("exchange"),
      lit(marketType).as("type"),
      lit(interval).as("interval"),
      timestamp_millis(col("timestamp")).as("timestamp"),
      timestamp_millis(col("close_time")).as("close_time")) ++
      priceCols.map(c => col(c).cast(priceType).as(c)) :+
      col("trades_count").cast("long").as("trades_count")
    raw.select(cols: _*).select(schema.fieldNames.map(col): _*)
  }

  /** Last-write-wins upsert key, exactly the ReplacingMergeTree ORDER BY
    * (`:568-569`). `versionCol` must be unique per key (ingest sequence).
    */
  def dedupe(klines: DataFrame, versionCol: String): DataFrame =
    Dedup.keepLast(klines, Seq("symbol", "interval", "timestamp"), Seq(versionCol))

  /** 1m→1h (or any) bar resample — the configured downstream use
    * (`config.json:18`: intervals ["1m","1h"]). Open/close follow bar time;
    * volumes and trade counts add. One hash aggregation, map-side partial.
    *
    * Grouping includes the SOURCE `interval`: a table laid out with several
    * ingest intervals (the configured [1m,1h]) must not merge rows across
    * them — summing a 1m and a 1h bar into one window double-counts volume.
    * `sourceInterval` (default "1m") selects which series feeds the bars;
    * the filter prunes at the scan when interval is a partition/sort key.
    *
    * NOTE the filter is exact-match on the `interval` label: a table that
    * labels its base series differently (e.g. "1min") yields an EMPTY
    * result with the default — pass the table's own label as
    * `sourceInterval`. The empty frame is deliberate (an eager existence
    * check would force an action inside a lazy operator); validate labels
    * with `klines.select("interval").distinct()` when unsure.
    */
  def resample(
      klines: DataFrame, target: String, targetInterval: String,
      sourceInterval: String = "1m"): DataFrame = {
    val ord = col("timestamp")
    klines
      .filter(col("interval") === sourceInterval)
      .groupBy(col("symbol"), col("exchange"), col("type"),
        window(col("timestamp"), target).as("__w"))
      .agg(
        min_by(col("open"), ord).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), ord).as("close"),
        // decimal sums widen to (28,8); cast back to the canonical (18,8)
        // (exact for any real volume — overflow needs 10^10 base units)
        sum(col("volume")).cast(priceType).as("volume"),
        sum(col("quote_volume")).cast(priceType).as("quote_volume"),
        sum(col("taker_buy_volume")).cast(priceType).as("taker_buy_volume"),
        sum(col("taker_buy_quote_volume")).cast(priceType).as("taker_buy_quote_volume"),
        sum(col("trades_count")).as("trades_count"),
        max(col("close_time")).as("close_time"))
      .withColumn("interval", lit(targetInterval))
      .withColumn("timestamp", col("__w.start"))
      .drop("__w")
      .select(schema.fieldNames.map(col): _*)
  }

  /** Funding/margin-rate numeric coercion: `pd.to_numeric(errors='coerce')
    * .fillna(0)` (`additional_data.py:118-119,239`) → try_cast + coalesce
    * (plain cast THROWS under Spark 4's default ANSI mode). Fine here
    * because rate columns almost always parse — try_cast's failure path
    * throws-and-catches per row (~20µs), so a MOSTLY-garbage column should
    * take the regex-guarded form instead (see q28_try_cast).
    */
  def coerceNumeric(c: Column): Column =
    coalesce(c.try_cast("double"), lit(0.0))

  /** Margin interest-rate rows (`MARGIN_RATES_SCHEMA`
    * `crypto_data_pipeline_clickhouse.py:511-518`; fetch normalization
    * `additional_data.py:207-245`): epoch-ms → timestamp, coerced rate,
    * literal exchange/vip stamps.
    */
  val marginRatesSchema = StructType(Seq(
    StructField("asset", StringType), StructField("exchange", StringType),
    StructField("timestamp", TimestampType),
    StructField("daily_interest_rate", DoubleType),
    StructField("vip_level", IntegerType)))

  def normalizeMarginRates(raw: DataFrame, asset: String, exchange: String,
                           vipLevel: Int): DataFrame =
    raw.select(
      lit(asset).as("asset"),
      lit(exchange).as("exchange"),
      timestamp_millis(col("timestamp")).as("timestamp"),
      coerceNumeric(col("dailyInterestRate")).as("daily_interest_rate"),
      lit(vipLevel).as("vip_level"))

  /** Align each kline to the latest funding rate at-or-before its bar time —
    * the star-schema temporal join every consumer of `bn_funding_rates` ×
    * kline tables performs (SURVEY.md §2.4 J3).
    */
  def withFundingRate(klines: DataFrame, funding: DataFrame): DataFrame =
    AsOf.joinBackward(klines,
      funding.withColumnRenamed("fundingTime", "__ft"),
      keys = Seq("symbol"), leftTs = "timestamp", rightTs = "__ft",
      valueCols = Seq("fundingRate", "markPrice"))
}
