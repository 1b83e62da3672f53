package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** OHLCV resample (SURVEY.md A5: the 1m→1h kline producer) + sessionization. */
class ResampleSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ohlcv: open/close by time order, high/low extremes, volume preserved") {
    val ticks = Seq(
      // (symbol, ts micros within one hour bucket, id, price)
      ("BTC", 60_000_000L, 1L, 10.0),
      ("BTC", 120_000_000L, 2L, 15.0),
      ("BTC", 180_000_000L, 3L, 8.0),
      ("BTC", 240_000_000L, 4L, 12.0),
      // second bucket
      ("BTC", 3_660_000_000L, 5L, 20.0)
    ).toDF("symbol", "ts_us", "id", "price")
      .withColumn("tstamp", timestamp_micros($"ts_us"))

    val out = Resample.ohlcv(ticks, Seq("symbol"), "tstamp",
        Seq("ts_us", "id"), "price", "1 hour")
      .orderBy("bucket_start")
      .select("open", "high", "low", "close", "volume", "n_ticks")
      .as[(Double, Double, Double, Double, Double, Long)].collect().toSeq

    assert(out === Seq(
      (10.0, 15.0, 8.0, 12.0, 45.0, 4L),
      (20.0, 20.0, 20.0, 20.0, 20.0, 1L)))
  }

  test("ohlcv invariants: sum(volume) == sum(values); high >= max(open, close)") {
    val ticks = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val bars = Resample.ohlcv(ticks, Seq("event_type"), "tstamp",
      Seq("ts_us", "event_id"), "value", "1 hour")
    val totVol = bars.agg(sum("volume")).head.getDouble(0)
    val totVal = ticks.agg(sum("value")).head.getDouble(0)
    assert(math.abs(totVol - totVal) < 1e-6)
    assert(bars.filter($"high" < $"open" || $"high" < $"close" ||
      $"low" > $"open" || $"low" > $"close").isEmpty)
  }

  test("sessionize: gap > threshold starts a new session") {
    val ev = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 250L, 3L),   // gaps 100, 150
      (1L, 1000L, 4L),                                 // gap 750 -> new session
      (2L, 0L, 5L)
    ).toDF("user_id", "ts_us", "event_id").withColumn("value", lit(1.0))

    val out = Sessionize.aggregate(ev, Seq("user_id"), "ts_us",
        Seq("event_id"), gapUs = 500L, valueCol = "value")
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}
