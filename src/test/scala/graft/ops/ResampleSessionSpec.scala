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

  test("property: ohlcv == brute-force reference on random tie-heavy data") {
    val rng = new scala.util.Random(4242)
    // duplicate timestamps on purpose: the tie-break must decide open/close
    val rows = (0 until 400).map { i =>
      (s"t${rng.nextInt(3)}",
        3600000L * rng.nextInt(3) + rng.nextInt(8) * 60000L, // 3 hours, 8 slots
        i.toLong, math.rint(rng.nextDouble() * 1000) / 100.0)
    }
    val df = rows.toDF("etype", "ms", "eid", "value")
      .withColumn("tstamp", timestamp_millis($"ms"))
      .withColumn("ts_us", $"ms" * 1000L)
    val got = Resample.ohlcv(df, Seq("etype"), "tstamp",
        tieBreak = Seq("ts_us", "eid"), valueCol = "value", interval = "1 hour")
      .select($"etype", unix_millis($"bucket_start").as("b"),
        $"open", $"high", $"low", $"close", $"volume", $"n_ticks")
      .as[(String, Long, Double, Double, Double, Double, Double, Long)]
      .collect().toSet
    val want = rows.groupBy(r => (r._1, r._2 / 3600000L * 3600000L)).map {
      case ((et, b), grp) =>
        val sorted = grp.sortBy(r => (r._2, r._3)) // (ts, eid) total order
        (et, b, sorted.head._4, grp.map(_._4).max, grp.map(_._4).min,
          sorted.last._4, grp.map(_._4).sum, grp.size.toLong)
    }.toSet
    // volumes: compare at 1e-9 via rounding (sum order differs)
    def norm(s: Set[(String, Long, Double, Double, Double, Double, Double, Long)]) =
      s.map(t => t.copy(_7 = math.rint(t._7 * 1e9) / 1e9))
    assert(norm(got) === norm(want))
  }
}
