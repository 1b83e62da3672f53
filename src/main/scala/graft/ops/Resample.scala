package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window OHLCV resampling.
  *
  * The reference's kline tables *are* pre-aggregated OHLCV bars fetched from
  * the API per interval (`config.json:18`, `KLINES_SCHEMA`
  * `app/src/crypto_data_pipeline_clickhouse.py:444-460`); a native engine must
  * be able to produce them — 1m→1h resample is the configured use-case
  * (SURVEY.md §2.5 A5). One hash aggregation with map-side partial combine:
  * open/close via `min_by`/`max_by` on a total tie-break ordering, so the
  * result is deterministic regardless of partitioning — no sort, no window
  * buffer, scales linearly.
  */
object Resample {

  /** Aggregate `valueCol` into `interval`-wide tumbling OHLCV bars per
    * `keyCols`. `tsCol` must be TimestampType; `tieBreak` makes the
    * first/last-in-bucket ordering total (e.g. a unique event id).
    * Output: keyCols, bucket_start (timestamp), open, high, low, close,
    * volume (sum of valueCol), n_ticks.
    */
  def ohlcv(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieBreak: Seq[String],
      valueCol: String,
      interval: String): DataFrame = {
    val ord: Column = struct((col(tsCol) +: tieBreak.map(col)): _*)
    df.groupBy((keyCols.map(col) :+ window(col(tsCol), interval).as("__w")): _*)
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        sum(col(valueCol)).as("volume"),
        count(lit(1)).as("n_ticks"))
      .withColumn("bucket_start", col("__w.start"))
      .drop("__w")
      .select((keyCols.map(col) :+ col("bucket_start")) ++
        Seq("open", "high", "low", "close", "volume", "n_ticks").map(col): _*)
  }
}
