package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bucketed interval join (q78): equi-join on time cells must reproduce the
  * naive non-equi join exactly, for every bucket width.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pts = Seq(
    (1L, 0L), (2L, 5L), (3L, 10L), (4L, 15L), (5L, 99L), (6L, 100L), (7L, 101L)
  ).toDF("pt_id", "ts")

  // [lo, hi) windows: one tiny, one spanning many buckets, one empty-range
  private def ivs = Seq(
    (10L, 5L, 6L),      // exactly one point (ts=5)
    (20L, 0L, 101L),    // wide: spans many cells, excludes ts=101
    (30L, 11L, 15L),    // no points (15 excluded)
    (40L, 100L, 200L)   // starts exactly at a point
  ).toDF("win_id", "lo", "hi")

  private def naive = ivs.join(pts, $"ts" >= $"lo" && $"ts" < $"hi")
    .select("win_id", "pt_id")

  test("bucketed join == naive non-equi join across bucket widths") {
    for (bucket <- Seq(1L, 3L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalJoin(pts, "ts", ivs, "lo", "hi", bucket)
        .select("win_id", "pt_id")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"bucket=$bucket diverges from the naive join")
    }
  }

  test("half-open semantics: lo inclusive, hi exclusive") {
    val got = RangeJoin.intervalJoin(pts, "ts", ivs, "lo", "hi", 10L)
      .select($"win_id", $"pt_id").as[(Long, Long)].collect().toSet
    assert(got.contains((40L, 6L)))   // ts = lo
    assert(!got.exists(_ == (20L, 7L))) // ts = hi excluded
    assert(!got.exists(_._1 == 30L))  // empty window
  }

  test("each matching pair appears exactly once (no per-cell duplicates)") {
    val got = RangeJoin.intervalJoin(pts, "ts", ivs, "lo", "hi", 2L)
      .groupBy("win_id", "pt_id").count().filter($"count" > 1)
    assert(got.isEmpty)
  }

  test("randomized: bucketed == naive on 500 points x 100 intervals") {
    val rnd = new scala.util.Random(7)
    val p = (1 to 500).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pt_id", "ts")
    val iv = (1 to 100).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(500))
    }.toDF("win_id", "lo", "hi")
    val base = iv.join(p, $"ts" >= $"lo" && $"ts" < $"hi")
      .select("win_id", "pt_id")
    val got = RangeJoin.intervalJoin(p, "ts", iv, "lo", "hi", 256L)
      .select("win_id", "pt_id")
    assert(got.exceptAll(base).isEmpty && base.exceptAll(got).isEmpty)
  }
}
