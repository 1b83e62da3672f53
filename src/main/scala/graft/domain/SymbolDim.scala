package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symbol/instrument dimension extraction from exchange-info JSON — the
  * reference's S1/S2/S3 source operators
  * (`app/src/crypto_data_pipeline_clickhouse.py:110-188`), re-expressed as
  * higher-order array functions over a parsed JSON DataFrame (the engine
  * sees `spark.read.json` output; the HTTP call is driver-side I/O).
  */
object SymbolDim {

  /** First element of `filters` whose filterType matches — the reference's
    * `next((f for f in filters if f['filterType'] == t), None)` (:118-119).
    */
  def firstFilter(filters: Column, filterType: String): Column =
    try_element_at(filter(filters, f => f.getField("filterType") === filterType), lit(1))

  /** Spot symbol rows (S1): nested PRICE_FILTER / LOT_SIZE unnesting +
    * string→double tick/step sizes (:117-139).
    */
  def spotSymbols(exchangeInfo: DataFrame): DataFrame =
    exchangeInfo.select(explode(col("symbols")).as("s"))
      .select(
        col("s.symbol").as("symbol"),
        lit("binance").as("exchange"),
        col("s.baseAsset").as("base_asset"),
        col("s.quoteAsset").as("quote_asset"),
        (col("s.status") === "TRADING").as("is_trading"),
        col("s.isMarginTradingAllowed").as("is_margin_trading_allowed"),
        coalesce(
          firstFilter(col("s.filters"), "PRICE_FILTER")
            .getField("minPrice").cast("double"), lit(0.0)).as("min_price"),
        coalesce(
          firstFilter(col("s.filters"), "PRICE_FILTER")
            .getField("tickSize").cast("double"), lit(0.0)).as("tick_size"),
        coalesce(
          firstFilter(col("s.filters"), "LOT_SIZE")
            .getField("stepSize").cast("double"), lit(0.0)).as("step_size"))

  /** Perp symbol rows (S3): keep only PERPETUAL contracts (:157), flatten
    * `underlyingSubType` to a comma-joined string (:165, F9).
    */
  def perpSymbols(exchangeInfo: DataFrame): DataFrame =
    exchangeInfo.select(explode(col("symbols")).as("s"))
      .filter(col("s.contractType") === "PERPETUAL")
      .select(
        col("s.symbol").as("symbol"),
        lit("binance").as("exchange"),
        col("s.baseAsset").as("base_asset"),
        col("s.quoteAsset").as("quote_asset"),
        array_join(col("s.underlyingSubType"), ",").as("underlying_sub_type"),
        to_timestamp(timestamp_millis(col("s.deliveryDate"))).as("delivery_date"),
        coalesce(
          firstFilter(col("s.filters"), "PRICE_FILTER")
            .getField("tickSize").cast("double"), lit(0.0)).as("tick_size"),
        coalesce(
          firstFilter(col("s.filters"), "LOT_SIZE")
            .getField("stepSize").cast("double"), lit(0.0)).as("step_size"))
}
