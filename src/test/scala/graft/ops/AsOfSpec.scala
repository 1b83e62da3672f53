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

  test("property: as-of == brute-force reference on random dense-tie data") {
    val rng = new scala.util.Random(2026)
    // small ts range + few keys forces heavy ties/boundary collisions
    val leftRows = (0 until 300).map { i =>
      (s"k${rng.nextInt(4)}", rng.nextInt(25).toLong, i.toLong)
    }
    val rightRows = (0 until 200).map { j =>
      (s"k${rng.nextInt(4)}", rng.nextInt(25).toLong, j.toLong, rng.nextDouble())
    }
    val left = leftRows.toDF("k", "ts", "lid")
    val right = rightRows.toDF("k", "ts", "seq", "v")
    val got = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts",
        valueCols = Seq("v"), rightVersion = Seq("seq"))
      .select("k", "ts", "lid", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSet
    val want = leftRows.map { case (k, lts, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= lts)
      val best = if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2, r._3))._4) // latest ts, then version
      (k, lts, lid, best)
    }.toSet
    assert(got === want)
  }

  test("forward as-of: inclusive boundary, earliest following, null after last") {
    val klines = Seq(
      ("BTC", 5L), ("BTC", 10L), ("BTC", 15L),
      ("ETH", 3L)
    ).toDF("symbol", "ts")
    val funding = Seq(
      ("BTC", 5L, 0.01),   // equal ts -> matches the ts=5 kline (inclusive)
      ("BTC", 12L, 0.02),
      ("ETH", 1L, 0.09)    // before ETH's only kline -> no match
    ).toDF("symbol", "ts", "rate")

    val out = AsOf.joinForward(klines, funding,
        keys = Seq("symbol"), leftTs = "ts", rightTs = "ts",
        valueCols = Seq("rate"))
      .orderBy("symbol", "ts")
      .select("symbol", "ts", "rate")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq

    assert(out === Seq(
      ("BTC", 5L, Some(0.01)),   // inclusive
      ("BTC", 10L, Some(0.02)),  // earliest following
      ("BTC", 15L, None),        // nothing after
      ("ETH", 3L, None)))
  }

  test("forward tie among right rows at same ts: highest version wins") {
    val left = Seq(("A", 10L)).toDF("k", "ts")
    val right = Seq(("A", 10L, 1L, 1.0), ("A", 10L, 2L, 2.0))
      .toDF("k", "ts", "seq", "v")
    val out = AsOf.joinForward(left, right, Seq("k"), "ts", "ts",
        valueCols = Seq("v"), rightVersion = Seq("seq"))
      .select("v").as[Double].collect().toSeq
    assert(out === Seq(2.0))
  }

  test("property: forward as-of == brute-force reference on random dense-tie data") {
    val rng = new scala.util.Random(4072)
    val leftRows = (0 until 300).map { i =>
      (s"k${rng.nextInt(4)}", rng.nextInt(25).toLong, i.toLong)
    }
    val rightRows = (0 until 200).map { j =>
      (s"k${rng.nextInt(4)}", rng.nextInt(25).toLong, j.toLong, rng.nextDouble())
    }
    val left = leftRows.toDF("k", "ts", "lid")
    val right = rightRows.toDF("k", "ts", "seq", "v")
    val got = AsOf.joinForward(left, right, Seq("k"), "ts", "ts",
        valueCols = Seq("v"), rightVersion = Seq("seq"))
      .select("k", "ts", "lid", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSet
    val want = leftRows.map { case (k, lts, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 >= lts)
      val best = if (cands.isEmpty) None
        else {
          val minTs = cands.map(_._2).min // earliest ts, then highest version
          Some(cands.filter(_._2 == minTs).maxBy(_._3)._4)
        }
      (k, lts, lid, best)
    }.toSet
    assert(got === want)
  }
}
