package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Weighted median (q131): crossing-point selection ≡ sequential
  * reference, equal weights ≡ lower median, heavy-hitter collapse,
  * randomized agreement.
  */
class WeightedMedianSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Long)]): Map[String, (Double, Long)] =
    WeightedMedian.perGroup(rows.toDF("g", "v", "w"), Seq("g"), "v", "w")
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  /** Sequential lower weighted median. */
  private def ref(rows: Seq[(String, Double, Long)]): Map[String, (Double, Long)] =
    rows.groupBy(_._1).collect { case (g, rs) if rs.map(_._3).sum > 0 =>
      val byV = rs.groupBy(_._2).map { case (v, a) => v -> a.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      val med = byV.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
      g -> (med, tot)
    }

  test("hand-checked: weight mass pulls the median off the row median") {
    // values 1..4; weight 10 on value 4 dominates
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L), ("a", 4.0, 10L))
    assert(run(rows) === Map("a" -> (4.0, 13L)))
  }

  test("equal weights == classic lower median; even and odd sizes") {
    val odd = Seq("a" -> 5.0, "a" -> 1.0, "a" -> 3.0).map(t => (t._1, t._2, 1L))
    val even = Seq("b" -> 4.0, "b" -> 1.0, "b" -> 3.0, "b" -> 2.0)
      .map(t => (t._1, t._2, 1L))
    assert(run(odd ++ even) === Map("a" -> (3.0, 3L), "b" -> (2.0, 4L)))
  }

  test("duplicate values collapse; zero-weight rows don't move the median") {
    val rows = Seq(("a", 2.0, 3L), ("a", 2.0, 3L), ("a", 9.0, 5L),
      ("a", 1.0, 0L), ("b", 7.0, 0L))
    // a: cum(2)=6, tot=11 → 12 ≥ 11 crosses at 2.0; b: zero total dropped
    assert(run(rows) === Map("a" -> (2.0, 11L)))
  }

  test("randomized: distributed == sequential reference (3 seeds)") {
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(500) {
        (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toDouble, rnd.nextInt(4).toLong)
      }
      assert(run(rows) === ref(rows), s"seed=$seed")
    }
  }

  private def runQ(rows: Seq[(String, Double, Long)], qs: Seq[(Int, Int)]) =
    WeightedMedian.perGroupQuantiles(rows.toDF("g", "v", "w"),
        Seq("g"), "v", "w", qs)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
      .map(r => (r._1, r._2, r._3) -> r._4).toMap

  /** Sequential lower weighted quantile at num/den. */
  private def refQ(rows: Seq[(String, Double, Long)], num: Int, den: Int) =
    rows.groupBy(_._1).collect { case (g, rs) if rs.map(_._3).sum > 0 =>
      val byV = rs.groupBy(_._2).map { case (v, a) => v -> a.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      g -> byV.find { case (_, w) => cum += w; den * cum >= num.toLong * tot }
        .get._1
    }

  test("quantiles: q=1/2 matches perGroup; q=1/1 is the max; quartiles == reference") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(400) {
      (s"g${rnd.nextInt(4)}", rnd.nextInt(30).toDouble, rnd.nextInt(5).toLong)
    }
    val got = runQ(rows, Seq((1, 4), (1, 2), (3, 4), (1, 1)))
    val med = run(rows)
    for ((g, (m, _)) <- med) assert(got((g, 1L, 2L)) === m)
    for ((g, rs) <- rows.groupBy(_._1) if rs.map(_._3).sum > 0)
      assert(got((g, 1L, 1L)) ===
        rs.filter(_._3 > 0).map(_._2).max)
    for ((n, d) <- Seq((1, 4), (3, 4)); (g, v) <- refQ(rows, n, d))
      assert(got((g, n.toLong, d.toLong)) === v, s"q=$n/$d g=$g")
  }
}
