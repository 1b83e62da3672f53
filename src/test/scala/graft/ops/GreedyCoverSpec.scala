package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GreedyCoverSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.TestSpark.spark
  import spark.implicits._

  private def run(items: Seq[(String, Long, Seq[String])], k: Int) =
    GreedyCover.select(items.toDF("g", "id", "toks"), "g", "id", "toks", k)
      .as[(String, Long, Int, Long)].collect()
      .map { case (g, id, step, gain) => (g, step) -> (id, gain) }.toMap

  test("greedy picks max marginal coverage, ties to smallest id") {
    val items = Seq(
      ("x", 1L, Seq("a", "b", "c")),      // biggest set → step 1
      ("x", 2L, Seq("a", "b")),           // fully covered after 1
      ("x", 3L, Seq("c", "d")),           // gain 1 after 1
      ("x", 4L, Seq("e", "f")))           // gain 2 → step 2
    val r = run(items, 3)
    assert(r(("x", 1)) === (1L, 3L))
    assert(r(("x", 2)) === (4L, 2L))
    assert(r(("x", 3)) === (3L, 1L))      // d is the only new token left
  }

  test("duplicate tokens within an item count once; groups are independent") {
    val items = Seq(
      ("x", 1L, Seq("a", "a", "a")),      // gain 1, not 3
      ("x", 2L, Seq("b", "c")),
      ("y", 9L, Seq("z")))
    val r = run(items, 1)
    assert(r(("x", 1)) === (2L, 2L))
    assert(r(("y", 1)) === (9L, 1L))
  }

  test("fewer items than k yields that many steps, zero-gain picks eligible") {
    val items = Seq(
      ("x", 1L, Seq("a", "b")),
      ("x", 2L, Seq("a", "b")))           // second pick covers nothing new
    val r = run(items, 5)
    assert(r.size === 2)
    assert(r(("x", 1)) === (1L, 2L))      // id tiebreak at equal gain
    assert(r(("x", 2)) === (2L, 0L))
  }
}
