package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** 2-D skyline (q143): bucket-prune + exact windows ≡ brute-force O(n²)
  * dominance, bucket-width invariance, tie handling.
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Double)],
                  width: Long): Set[(String, Long)] =
    Skyline.skyline2d(rows.toDF("g", "id", "x", "y"), Seq("g"), "x", "y",
        bucketWidth = width)
      .select("g", "id").as[(String, Long)].collect().toSet

  /** Brute-force dominance: keep p iff no q with both >= and one >.
    * (.toSeq before flatMap — flatMapping a Map into key-value tuples
    * re-collapses by key and silently drops all but one point per group.)
    */
  private def ref(rows: Seq[(String, Long, Long, Double)]): Set[(String, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.filterNot { p =>
        rs.exists(q => q._3 >= p._3 && q._4 >= p._4 &&
          (q._3 > p._3 || q._4 > p._4))
      }.map(r => (r._1, r._2))
    }.toSet

  test("hand-checked: staircase frontier, dominated interior dropped") {
    val rows = Seq[(String, Long, Long, Double)](
      ("a", 1, 1, 9.0), ("a", 2, 5, 5.0), ("a", 3, 9, 1.0), // frontier
      ("a", 4, 3, 3.0), ("a", 5, 5, 4.9),                   // dominated
      ("b", 6, 2, 2.0))                                     // own group
    assert(run(rows, 2) === Set(("a", 1L), ("a", 2L), ("a", 3L), ("b", 6L)))
  }

  test("exact ties on both axes are mutually non-dominating — both kept") {
    val rows = Seq[(String, Long, Long, Double)](
      ("a", 1, 4, 7.0), ("a", 2, 4, 7.0), ("a", 3, 1, 1.0))
    assert(run(rows, 2) === Set(("a", 1L), ("a", 2L)))
  }

  test("randomized ≡ brute force, and invariant across bucket widths") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val rows = (1 to 300).map { i =>
        (s"g${rnd.nextInt(3)}", i.toLong, rnd.nextInt(20).toLong,
          (rnd.nextInt(40) / 2).toDouble)
      }
      val expected = ref(rows)
      assert(run(rows, 1) === expected, s"trial $trial width 1")
      assert(run(rows, 2) === expected, s"trial $trial width 2")
      assert(run(rows, 7) === expected, s"trial $trial width 7")
      assert(run(rows, 100) === expected, s"trial $trial width 100")
    }
  }

  test("empty group list = global frontier") {
    val rows = Seq[(String, Long, Long, Double)](
      ("a", 1, 1, 9.0), ("b", 2, 9, 1.0), ("c", 3, 2, 2.0))
    val got = Skyline.skyline2d(rows.toDF("g", "id", "x", "y"),
        Seq.empty, "x", "y")
      .select("id").as[Long].collect().toSet
    // (2,2) is NOT dominated: (1,9) has smaller x, (9,1) has smaller y.
    assert(got === Set(1L, 2L, 3L))
  }
}
