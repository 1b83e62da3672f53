package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Backward as-of join = funding-rate → kline alignment (SURVEY.md §2.4 J3).
  * Edge semantics under test: inclusive at equal timestamps, null when no
  * prior right row, latest right row wins.
  */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of: inclusive boundary, latest prior, null before first") {
    val klines = Seq(
      ("BTC", 5L), ("BTC", 10L), ("BTC", 15L),
      ("ETH", 3L)
    ).toDF("symbol", "ts")
    val funding = Seq(
      ("BTC", 5L, 0.01),   // equal ts -> matches the ts=5 kline (inclusive)
      ("BTC", 12L, 0.02),
      ("ETH", 9L, 0.09)    // after ETH's only kline -> no match
    ).toDF("symbol", "ts", "rate")

    val out = AsOf.joinBackward(klines, funding,
        keys = Seq("symbol"), leftTs = "ts", rightTs = "ts",
        valueCols = Seq("rate"))
      .orderBy("symbol", "ts")
      .select("symbol", "ts", "rate")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq

    assert(out === Seq(
      ("BTC", 5L, Some(0.01)),   // inclusive
      ("BTC", 10L, Some(0.01)),
      ("BTC", 15L, Some(0.02)),  // latest prior
      ("ETH", 3L, None)))        // nothing before
  }

  test("tie among right rows at same ts: highest version wins") {
    val left = Seq(("A", 10L)).toDF("k", "ts")
    val right = Seq(("A", 10L, 1L, 1.0), ("A", 10L, 2L, 2.0))
      .toDF("k", "ts", "seq", "v")
    val out = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts",
        valueCols = Seq("v"), rightVersion = Seq("seq"))
      .select("v").as[Double].collect().toSeq
    assert(out === Seq(2.0))
  }
}
